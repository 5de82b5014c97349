"""Sketch-operator invariants beyond the oracle gate."""

import numpy as np
import pandas as pd
import ray.data as rd


def test_cms_never_undercounts_and_is_batching_invariant():
    from nacc_form_validator_ray.stages.sketches import count_min_estimates
    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(300)]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(1, 40)))
             for _ in range(200)] + ["", None]
    df = pd.DataFrame({"text": texts})
    probes = ["w0", "w1", "w17", "w299", "absenttoken"]
    exact = pd.Series(
        " ".join(t for t in texts if t).split()).value_counts()
    est1 = count_min_estimates(rd.from_pandas(df).repartition(1),
                               probes).set_index("token")["est"]
    est4 = count_min_estimates(rd.from_pandas(df).repartition(4),
                               probes).set_index("token")["est"]
    # merging partials is exact: the grid is order/batching independent
    pd.testing.assert_series_equal(est1, est4)
    for t in probes:
        assert est1[t] >= int(exact.get(t, 0)), t
    assert est1["absenttoken"] >= 0
