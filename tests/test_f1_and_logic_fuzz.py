"""Keep/drop F1 evidence and vector-jsonLogic fuzzing.

The driver's north rule demands keep/drop F1 >= 0.99 vs the reference.
The reference itself cannot run here (its cerberus dependency is not
installed), so the evidence chain is: (1) the row validator reproduces
the reference's semantics (ported assertion suites), and (2) the
distributed pipeline's keep/drop decisions match the row validator
EXACTLY (F1 = 1.0) on the synthetic page corpus — asserted here.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from nacc_form_validator_ray.engine import CompiledSchema, VectorEvaluator
from nacc_form_validator_ray.json_logic import json_logic
from nacc_form_validator_ray.rowval import RecordValidator


def test_pipeline_keep_drop_f1_vs_row_oracle():
    from nacc_form_validator_ray.pipelines.quality_filter import (
        WEB_QUALITY_RULES, build_quality_pipeline)
    from nacc_form_validator_ray.pipelines.webgen import generate_pages
    from nacc_form_validator_ray.utils import Clock

    clock = Clock.frozen_now()
    ds = generate_pages(800, seed=13)
    out = build_quality_pipeline(ds, clock=clock).to_pandas() \
        .sort_values("url").reset_index(drop=True)

    rv = RecordValidator(WEB_QUALITY_RULES, allow_unknown=True,
                         clock=clock)
    signal_cols = list(WEB_QUALITY_RULES)
    tp = fp = fn = tn = 0
    for _, row in out.iterrows():
        rec = {c: row[c] for c in signal_cols}
        expected = rv.validate(rv.cast_record(rec))
        got = bool(row["passed"])
        if expected and got:
            tp += 1
        elif expected and not got:
            fn += 1
        elif not expected and got:
            fp += 1
        else:
            tn += 1
    assert fp == 0 and fn == 0, (tp, fp, fn, tn)  # F1 == 1.0
    assert tp > 0 and tn > 0  # both classes present


# ------------------------- vector jsonLogic vs row evaluator fuzzing

VARS = ["a", "b", "c"]

leaf = st.one_of(
    st.sampled_from([{"var": v} for v in VARS]),
    st.integers(-3, 3),
    st.floats(-3, 3, allow_nan=False, width=16),
    st.booleans(),
)


def formula(depth):
    if depth == 0:
        return leaf
    sub = formula(depth - 1)
    return st.one_of(
        leaf,
        st.tuples(st.sampled_from(["==", "!=", "<", "<=", ">", ">="]),
                  sub, sub).map(lambda t: {t[0]: [t[1], t[2]]}),
        st.tuples(st.sampled_from(["and", "or"]), sub, sub)
        .map(lambda t: {t[0]: [t[1], t[2]]}),
        st.tuples(st.sampled_from(["+", "-", "*"]), sub, sub)
        .map(lambda t: {t[0]: [t[1], t[2]]}),
        sub.map(lambda s: {"!": [s]}),
        st.tuples(sub, sub, sub).map(
            lambda t: {"if": [t[0], t[1], t[2]]}),
        st.tuples(sub, sub, sub).map(
            lambda t: {"count_exact": [t[0], t[1], t[2]]}),
    )


records_strategy = st.lists(
    st.fixed_dictionaries({
        v: st.one_of(st.none(), st.integers(-3, 3),
                     st.floats(-3, 3, allow_nan=False, width=16))
        for v in VARS}),
    min_size=1, max_size=10)


@settings(max_examples=120, deadline=None, derandomize=True)
@given(expr=formula(3), records=records_strategy)
def test_vector_logic_matches_row_evaluator(expr, records):
    from nacc_form_validator_ray.engine import _logic_vectorizable
    if not _logic_vectorizable(expr):
        return
    df = pd.DataFrame.from_records(records).astype(object)
    df = df.where(pd.notna(df), None)
    ev = VectorEvaluator(CompiledSchema({}, strict=False))
    try:
        vec = ev._truthiness(ev._eval_logic(expr, df), len(df))
    except (ValueError, ZeroDivisionError):
        vec = None
    for i, rec in enumerate(records):
        try:
            expected = bool(json_logic(expr, dict(rec)))
        except (ValueError, TypeError, ZeroDivisionError, OverflowError):
            continue  # row evaluator raised; engine treats as error row
        if vec is not None:
            assert bool(vec[i]) == expected, (rec, expr)
