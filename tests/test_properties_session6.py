"""Property-based tests (hypothesis) for the session-6 operators.

Each property is an EXACT invariant of the operator's contract — not a
statistical tendency — so hypothesis shrinks any violation to a minimal
counterexample.
"""

import datetime as dt

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@st.composite
def _event_logs(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    rows = []
    for i in range(n):
        user = draw(st.integers(min_value=1, max_value=3))
        kind = draw(
            st.sampled_from(["purchase", "click", "view", "error"])
        )
        ts = dt.datetime(2020, 1, 1) + dt.timedelta(
            hours=draw(st.integers(min_value=0, max_value=400))
        )
        value = (
            draw(st.integers(min_value=1, max_value=100000)) / 100.0
            if kind == "purchase"
            else None
        )
        rows.append((i, ts, user, kind, value))
    return rows


@given(_event_logs())
@settings(**_SETTINGS)
def test_attribution_conserves_cents_exactly(spark, rows):
    """Σ attributed_cents over ALL rows (touch types + unattributed)
    == Σ purchase cents, exactly — the operator's reconciliation
    contract, for any event log."""
    from pynomaly_spark.sequences import linear_attribution

    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    out = linear_attribution(
        df, "user_id", "ts", "event_id", "event_type", "value",
        "purchase", ["click", "view"],
    ).collect()
    total_attr = sum(r["attributed_cents"] for r in out)
    expect = sum(
        round(v * 100) for (_, _, _, k, v) in rows if k == "purchase"
    )
    assert total_attr == expect


@st.composite
def _activity(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    rows = []
    for _ in range(n):
        e = draw(st.integers(min_value=1, max_value=4))
        day = draw(st.integers(min_value=0, max_value=60))
        rows.append((e, dt.datetime(2020, 1, 1) + dt.timedelta(days=day)))
    return rows


@given(_activity())
@settings(**_SETTINGS)
def test_km_table_suffix_and_mass_identities(spark, rows):
    """n_at_risk is the exact suffix sum of (events+censored) in
    descending t, and total spell mass equals the number of positive
    spells derivable from the raw activity."""
    from pynomaly_spark.survival import km_table

    df = spark.createDataFrame(rows, "e long, ts timestamp")
    out = sorted(
        (r.asDict() for r in km_table(df, "e", "ts").collect()),
        key=lambda r: -r["t"],
    )
    run = 0
    for r in out:
        run += r["events"] + r["censored"]
        assert r["n_at_risk"] == run
        assert r["hazard_6dp"] == (r["events"] * 1000000) // r["n_at_risk"]
    # independent spell count from raw rows
    days = {}
    for e, ts in rows:
        days.setdefault(e, set()).add(
            (ts - dt.datetime(1970, 1, 1)).days
        )
    horizon = max(max(d) for d in days.values())
    spells = 0
    for d in days.values():
        ds = sorted(d)
        spells += sum(1 for a, b in zip(ds, ds[1:]) if b > a)
        if horizon - ds[-1] > 0:
            spells += 1
    assert sum(r["events"] + r["censored"] for r in out) == spells


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=23),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_presence_bitmap_popcount_equals_distinct_slots(spark, rows):
    from pynomaly_spark.profiling import presence_bitmap

    df = spark.createDataFrame(rows, "k string, s long")
    out = presence_bitmap(df, ["k"], "s", n_slots=24).collect()
    want = {}
    for k, s in rows:
        want.setdefault(k, set()).add(s)
    assert len(out) == len(want)
    for r in out:
        slots = want[r["k"]]
        assert r["mask"] == sum(1 << s for s in slots)
        assert r["slots_active"] == len(slots)
        assert r["n_rows"] == sum(1 for k, _ in rows if k == r["k"])


@given(
    st.lists(
        st.integers(min_value=0, max_value=50),
        min_size=2,
        max_size=64,
    )
)
@settings(**_SETTINGS)
def test_haar_level1_energy_matches_numpy(spark, xs):
    """Level-1 energy == Σ (x[2i] − x[2i+1])² over the dense series —
    verified against a direct numpy computation."""
    from pynomaly_spark.sequences import haar_energy

    df = spark.createDataFrame(
        [(i, int(x)) for i, x in enumerate(xs)], "t long, x long"
    )
    out = {
        r["level"]: r["energy"]
        for r in haar_energy(df, "t", "x", levels=1).collect()
    }
    a = np.asarray(xs, dtype=np.int64)
    if len(a) % 2:
        a = np.append(a, 0)
    want = int(((a[0::2] - a[1::2]) ** 2).sum())
    assert out[1] == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=3,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_spearman_matches_numpy_midranks(spark, pairs):
    """rho_6dp == floor(1e6 · Pearson(midranks)) computed directly in
    numpy (same doubled-midrank construction)."""
    from pynomaly_spark.profiling import spearman_rho

    df = spark.createDataFrame(pairs, "x long, y long")
    got = spearman_rho(df, "x", "y").collect()[0]["rho_6dp"]

    def doubled_midranks(v):
        v = np.asarray(v)
        out = np.empty(len(v), dtype=np.int64)
        for i, x in enumerate(v):
            out[i] = 2 * int((v < x).sum()) + int((v == x).sum()) + 1
        return out

    xs = doubled_midranks([p[0] for p in pairs]).astype(np.float64)
    ys = doubled_midranks([p[1] for p in pairs]).astype(np.float64)
    n = float(len(pairs))
    num = n * (xs * ys).sum() - xs.sum() * ys.sum()
    vx = n * (xs * xs).sum() - xs.sum() ** 2
    vy = n * (ys * ys).sum() - ys.sum() ** 2
    if vx <= 0 or vy <= 0:
        assert got is None
    else:
        want = int(np.floor(num * 1e6 / np.sqrt(vx * vy)))
        # the engine evaluates one IEEE tree; numpy's association can
        # differ in the last ulp, which moves a floor boundary by 1
        assert abs(got - want) <= 1
