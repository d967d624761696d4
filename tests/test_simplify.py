"""Douglas–Peucker simplification (simplify.py): kernel equality vs
an independent recursive reference, geometric guarantees, degenerate
inputs, and the Spark operator end-to-end."""
import numpy as np
import pandas as pd
import pytest

from areacity_query_geometry_spark import simplify


def _ref_dp(ix, iy, eps2):
    """Independent recursive reference (recursion instead of the
    kernel's explicit stack; same chord-line metric)."""
    n = len(ix)
    keep = set()

    def rec(i, j):
        if j - i < 2:
            return
        dx, dy = ix[j] - ix[i], iy[j] - iy[i]
        ln2 = dx * dx + dy * dy
        best, bestm = None, -1
        for k in range(i + 1, j):
            if ln2 == 0:
                m = (ix[k] - ix[i]) ** 2 + (iy[k] - iy[i]) ** 2
            else:
                c = dx * (iy[k] - iy[i]) - dy * (ix[k] - ix[i])
                m = c * c
            if m > bestm:
                best, bestm = k, m
        thr = eps2 if ln2 == 0 else eps2 * ln2
        if bestm > thr:
            keep.add(best)
            rec(i, best)
            rec(best, j)

    if n:
        keep |= {0, n - 1}
        rec(0, n - 1)
    return sorted(keep)


def test_kernel_matches_reference_random():
    rng = np.random.RandomState(17)
    for trial in range(30):
        n = int(rng.randint(1, 120))
        ix = rng.randint(0, 2560, n).astype(np.int64)
        iy = rng.randint(0, 2560, n).astype(np.int64)
        eps2 = int(rng.choice([0, 1, 64, 102400]))
        keep = simplify.dp_keep_mask(ix, iy, eps2)
        assert list(np.flatnonzero(keep)) == _ref_dp(ix, iy, eps2), \
            (trial, n, eps2)


def test_kernel_error_guarantee():
    """Every dropped vertex lies within eps of the simplified chord
    through its containing kept-interval (the DP contract, checked
    against the chord LINE)."""
    rng = np.random.RandomState(23)
    ix = rng.randint(0, 2560, 400).astype(np.int64)
    iy = rng.randint(0, 2560, 400).astype(np.int64)
    eps2 = 102400
    keep = np.flatnonzero(simplify.dp_keep_mask(ix, iy, eps2))
    for a, b in zip(keep[:-1], keep[1:]):
        dx, dy = ix[b] - ix[a], iy[b] - iy[a]
        ln2 = dx * dx + dy * dy
        for k in range(a + 1, b):
            if ln2 == 0:
                assert (ix[k] - ix[a]) ** 2 + (iy[k] - iy[a]) ** 2 <= eps2
            else:
                c = dx * (iy[k] - iy[a]) - dy * (ix[k] - ix[a])
                assert c * c <= eps2 * ln2


def test_degenerate_lines():
    # n = 1 and n = 2: endpoints only, always kept
    assert list(simplify.dp_keep_mask(
        np.array([5]), np.array([7]), 100)) == [True]
    assert list(simplify.dp_keep_mask(
        np.array([5, 9]), np.array([7, 7]), 0)) == [True, True]
    # exactly collinear interior: dropped at any eps
    ix = np.arange(10, dtype=np.int64)
    assert np.flatnonzero(
        simplify.dp_keep_mask(ix, 2 * ix, 0)).tolist() == [0, 9]
    # closed loop (equal endpoints) with a far excursion: the
    # degenerate-chord fallback must still split
    ix = np.array([0, 500, 0], dtype=np.int64)
    iy = np.array([0, 0, 0], dtype=np.int64)
    assert np.flatnonzero(
        simplify.dp_keep_mask(ix, iy, 100)).tolist() == [0, 1, 2]


def test_batch_kernel_equals_per_line_kernel():
    """dp_keep_mask_batch (breadth-first, many lines at once) must
    reproduce dp_keep_mask exactly — incl. argmax tiebreaks and
    degenerate closed-loop chords."""
    rng = np.random.RandomState(31)
    for trial in range(20):
        xs, ys, starts, want = [], [], [0], []
        for _ in range(int(rng.randint(1, 12))):
            n = int(rng.randint(1, 150))
            ix = rng.randint(0, 64, n).astype(np.int64)  # small range →
            iy = rng.randint(0, 64, n).astype(np.int64)  # frequent ties
            if n >= 3 and rng.rand() < 0.3:
                ix[-1], iy[-1] = ix[0], iy[0]            # closed loop
            eps2 = 64
            want.append(simplify.dp_keep_mask(ix, iy, eps2))
            xs.append(ix)
            ys.append(iy)
            starts.append(starts[-1] + n)
        got = simplify.dp_keep_mask_batch(
            np.concatenate(xs), np.concatenate(ys),
            np.array(starts, np.int64), 64)
        assert got.tolist() == np.concatenate(want).tolist(), trial


def test_assume_clustered_matches_general(spark):
    """A line-contiguous input through the zero-shuffle path must
    equal the general (repartition + sort) path exactly."""
    rng = np.random.RandomState(43)
    rows = []
    for g in range(6):
        n = int(rng.randint(5, 120))
        for s in range(n):
            rows.append((g, s, rng.randint(0, 2560) / 64.0,
                         rng.randint(0, 2560) / 64.0))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["line_id", "seq", "lng", "lat"]))
    # single partition → trivially clustered
    clustered = df.coalesce(1)
    a = sorted(map(tuple, simplify.simplify_lines(
        clustered, 5.0, assume_clustered=True).collect()))
    b = sorted(map(tuple, simplify.simplify_lines(
        df.repartition(4), 5.0).collect()))
    assert a == b


def test_assume_clustered_rejects_unsorted(spark):
    """Mis-declared input (seq not sorted within a line run) fails
    loudly instead of silently simplifying garbage."""
    df = spark.createDataFrame(
        [(1, 2, 0.5, 0.5), (1, 0, 5.5, 0.5), (1, 1, 9.5, 9.5)],
        "line_id long, seq long, lng double, lat double").coalesce(1)
    with pytest.raises(Exception, match="not seq-sorted"):
        simplify.simplify_lines(df, 5.0, assume_clustered=True).collect()


def test_assume_clustered_rejects_line_revisit(spark):
    """A line appearing in two separate runs in one partition fails
    loudly (the clustered contract)."""
    rows = [(1, s, s / 64.0, 0.0) for s in range(3)] \
        + [(2, s, s / 64.0, 1.0) for s in range(3)] \
        + [(1, s, s / 64.0, 2.0) for s in range(3, 6)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["line_id", "seq", "lng", "lat"])
    ).coalesce(1)
    with pytest.raises(Exception, match="two separate runs"):
        simplify.simplify_lines(df, 5.0, assume_clustered=True).collect()


def test_spark_operator_end_to_end(spark):
    rng = np.random.RandomState(29)
    rows = []
    expect = {}
    for g in range(3):
        n = int(rng.randint(5, 200))
        ix = rng.randint(0, 2560, n).astype(np.int64)
        iy = rng.randint(0, 2560, n).astype(np.int64)
        rows += [(g, s, ix[s] / 64.0, iy[s] / 64.0) for s in range(n)]
        expect[g] = _ref_dp(ix, iy, 102400)
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["line_id", "seq", "lng", "lat"])
    ).repartition(5)
    out = simplify.simplify_lines(df, eps_deg=5.0)
    pdf = out.toPandas().sort_values(["line_id", "rank"])
    for g, grp in pdf.groupby("line_id"):
        assert list(grp["rank"]) == list(range(len(grp)))
        assert list(grp["seq"]) == expect[g]
