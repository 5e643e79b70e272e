"""mAP protocol golden tests — hand-computed values (SURVEY.md §7: junk
handling is 'notoriously easy to get subtly wrong')."""
import numpy as np
import pytest

from instsearch_tpu.eval import compute_ap, evaluate_ranks, precision_at


def test_perfect_ranking_ap_is_one():
    assert compute_ap(np.array([0, 1, 2, 9, 8]), {0, 1, 2}, set()) == pytest.approx(1.0)


def test_ap_hand_computed_with_junk():
    # ranked [0, 2(junk), 3, 1]; positives {0,1}; junk {2}
    # hit@eff0: (1 + 1)/2 * 1/2 = 0.5 ; hit@eff2: (1/2 + 2/3)/2 * 1/2 = 0.2917
    ap = compute_ap(np.array([0, 2, 3, 1]), {0, 1}, {2})
    assert ap == pytest.approx(0.5 + (0.5 + 2 / 3) / 4, abs=1e-9)


def test_junk_neither_helps_nor_hurts():
    base = compute_ap(np.array([5, 0, 1]), {0, 1}, set())
    with_junk = compute_ap(np.array([5, 9, 0, 9, 1]), {0, 1}, {9})
    assert base == pytest.approx(with_junk)


def test_positives_at_end():
    # ranked [2,3,0,1], positives {0,1}: kit trapezoid gives
    # (0 + 1/3)/2 * 1/2  +  (1/3 + 1/2)/2 * 1/2  =  7/24
    ap = compute_ap(np.array([2, 3, 0, 1]), {0, 1}, set())
    assert ap == pytest.approx(7 / 24, abs=1e-9)


def test_precision_at_k():
    ranked = np.array([0, 9, 1, 2, 3])
    assert precision_at(ranked, {0, 1}, {9}, 2) == pytest.approx(1.0)   # junk skipped
    assert precision_at(ranked, {0, 3}, set(), 4) == pytest.approx(0.5)
    # fewer positives than k: denominator is #positives
    assert precision_at(ranked, {0}, set(), 10) == pytest.approx(1.0)


def test_protocols_compose_sets():
    gnd = [{"easy": [0], "hard": [1], "junk": [2]}]
    ranks = np.array([[0, 1, 2, 3]])
    med = evaluate_ranks(ranks, gnd, "medium")
    hard = evaluate_ranks(ranks, gnd, "hard")
    easy = evaluate_ranks(ranks, gnd, "easy")
    assert med["mAP"] == pytest.approx(100.0)     # both positives on top
    assert hard["mAP"] == pytest.approx(100.0)    # easy becomes junk, skipped
    assert easy["mAP"] == pytest.approx(100.0)
    # hard protocol with a distractor above the hard positive
    # single positive at non-junk rank 2: official-kit trapezoid = (0+1/2)/2
    ranks2 = np.array([[0, 3, 1, 2]])
    hard2 = evaluate_ranks(ranks2, gnd, "hard")
    assert hard2["mAP"] == pytest.approx(25.0)


def test_query_without_positives_excluded():
    gnd = [{"easy": [], "hard": [], "junk": [1]},
           {"easy": [0], "hard": [], "junk": []}]
    res = evaluate_ranks(np.array([[0, 1], [0, 1]]), gnd, "medium")
    assert res["num_queries"] == 1
    assert np.isnan(res["per_query_ap"][0])


def test_fast_ap_equals_reference_loop():
    """evaluate_ranks now uses the vectorized AP/P@k; they must equal the
    reference loop implementations (compute_ap / precision_at) exactly on
    randomized protocol data including junk-heavy and no-hit queries."""
    rng = np.random.default_rng(17)
    for trial in range(30):
        n = int(rng.integers(5, 200))
        ranked = rng.permutation(n).astype(np.int64)
        pos = set(rng.choice(n, size=int(rng.integers(1, max(2, n // 3))),
                             replace=False).tolist())
        junk_pool = [i for i in range(n) if i not in pos]
        junk = set(rng.choice(junk_pool,
                              size=int(rng.integers(0, max(1, len(junk_pool) // 2))),
                              replace=False).tolist()) if junk_pool else set()
        from instsearch_tpu.eval.revisited import _ap_fast, _patk_fast
        pos_a = np.fromiter(pos, dtype=ranked.dtype, count=len(pos))
        junk_a = np.fromiter(junk, dtype=ranked.dtype, count=len(junk))
        assert _ap_fast(ranked, pos_a, junk_a) == pytest.approx(
            compute_ap(ranked, pos, junk), abs=1e-12)
        want = [precision_at(ranked, pos, junk, k) for k in (1, 5, 10)]
        got = _patk_fast(ranked, pos_a, junk_a, (1, 5, 10))
        assert got == pytest.approx(want, abs=1e-12)
