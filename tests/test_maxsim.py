"""Independent-math pin for the late-interaction MaxSim kernel."""

from __future__ import annotations

import math

import numpy as np

from console_datagen_spark.plans import get_query
from console_datagen_spark.plans.similarity import (
    _MAXSIM_D,
    _MAXSIM_K,
    _MAXSIM_NQ,
    _MAXSIM_T,
)


def test_maxsim_matches_numpy_reference(duck, sf_dir):
    """The SQL's integer MaxSim equals sum_i max_j <q_i, d_j> computed
    independently in numpy over the same floor-quantized reshape, and
    the emitted top-k ranking equals the reference argsort with the
    (score DESC, neighbor_id) tie-break."""
    rows = duck.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    toks = {
        vid: np.floor(
            np.array(vec, dtype=np.float64) * 1000
        ).astype(np.int64).reshape(_MAXSIM_T, _MAXSIM_D)
        for vid, vec in rows
    }
    want: dict[int, list[tuple[int, int]]] = {}
    for qid in range(_MAXSIM_NQ):
        scored = []
        for nid, dt in toks.items():
            if nid == qid:
                continue
            # (T_q x D) @ (D x T_d) -> per-token-pair dots; max over
            # doc tokens, sum over query tokens
            s = int((toks[qid] @ dt.T).max(axis=1).sum())
            scored.append((-s, nid))
        scored.sort()
        want[qid] = [(nid, -neg) for neg, nid in scored[:_MAXSIM_K]]
    got = duck.execute(get_query("sim_maxsim_late_interaction").oracle).fetchall()
    assert len(got) == _MAXSIM_NQ * _MAXSIM_K
    for query_id, neighbor_id, maxsim, rnk in got:
        ref_nid, ref_score = want[query_id][rnk - 1]
        assert (neighbor_id, maxsim) == (ref_nid, ref_score), (
            query_id,
            rnk,
        )


def test_maxsim_quantized_dots_exact_in_double():
    """The DuckDB side computes dots via double list_inner_product over
    integer-valued inputs; confirm the worst-case magnitude for this
    fixture stays far below 2^53 so that path is exact."""
    bound = _MAXSIM_D * (1000**2) * 4  # |x| <= ~2 after quantization
    assert bound < 2**53
    assert math.ulp(float(bound)) < 1
