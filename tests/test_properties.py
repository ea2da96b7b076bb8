"""Property-based tests (SURVEY.md §5.5): algebraic invariants the engine
must hold for arbitrary inputs, via hypothesis.

Each example builds a small literal DataFrame (a Spark round-trip per
example is expensive — examples are capped and deadlines disabled), so
these probe edge cases unit fixtures miss: empty arrays, nulls in every
nullable slot, unicode-ish strings, boundary integers.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from blockchain_data_ingestion_spark.schemas import (
    BLOCK_MESSAGE_SCHEMA,
    TRANSACTION_SCHEMA,
)

# printable-ascii identifiers: the wire format is hex strings / names;
# avoids whitespace-normalization false alarms in JSON comparison.
_s = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1, max_size=12)
_u64 = st.integers(min_value=0, max_value=2**62)
_u256s = st.integers(min_value=0, max_value=10**30).map(str)


def _tx(i: int, draw) -> dict:
    return {
        "tx_hash": draw(_s), "block_number": draw(st.none() | _u64),
        "transaction_index": i,
        "from_address": draw(_s), "to_address": draw(st.none() | _s),
        "value": draw(st.none() | _u256s),
        "gas_price": draw(st.none() | _u256s), "gas": draw(_u256s),
        "input": draw(st.none() | _s), "nonce": draw(st.none() | _u64),
    }


@st.composite
def _block(draw) -> dict:
    return {
        "block_number": draw(_u64), "chain_name": draw(_s),
        "hash": draw(_s), "parent_hash": draw(_s),
        "timestamp": draw(_u64), "miner": draw(_s),
        "difficulty": draw(st.none() | _u256s),
        "total_difficulty": draw(st.none() | _u256s),
        "gas_used": draw(st.none() | _u64), "gas_limit": draw(st.none() | _u64),
        "size": draw(st.none() | _u64),
        "receipts_root": draw(st.none() | _s),
        "extra_data": draw(st.none() | _s),
        "logs_bloom": draw(st.none() | _s),
        "transactions": [
            _tx(i, draw) for i in range(draw(st.integers(0, 3)))],
        "uncles": draw(st.none() | st.lists(_s, max_size=2)),
    }


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_block(), min_size=1, max_size=4))
def test_json_roundtrip_identity(spark, blocks):
    """to_json ∘ from_json == id on the block wire schema — the engine's
    serialize/consume hop (json_serialize / json_parse ops) must be
    lossless for any schema-conformant message."""
    df = spark.createDataFrame(blocks, schema=BLOCK_MESSAGE_SCHEMA)
    back = (df.select(F.to_json(F.struct(*df.columns),
                                {"ignoreNullFields": "false"}).alias("j"))
              .select(F.from_json("j", BLOCK_MESSAGE_SCHEMA).alias("m"))
              .select("m.*"))
    orig = [r.asDict(recursive=True) for r in df.collect()]
    rt = [r.asDict(recursive=True) for r in back.collect()]
    key = lambda r: (r["chain_name"], r["block_number"], r["hash"])  # noqa: E731
    assert sorted(orig, key=key) == sorted(rt, key=key)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_block(), min_size=1, max_size=4))
def test_explode_collect_inverse(spark, blocks):
    """arr_explode then agg_collect reproduces each block's transaction
    multiset (the reference's core unnest, evm_consumer.rs:124-126, must
    be invertible)."""
    df = spark.createDataFrame(blocks, schema=BLOCK_MESSAGE_SCHEMA)
    exploded = df.select("hash", F.explode("transactions").alias("tx"))
    renested = (exploded.groupBy("hash")
                .agg(F.collect_list("tx").alias("txs")))
    got = {r["hash"]: sorted(json.dumps(t.asDict(recursive=True),
                                        sort_keys=True)
                             for t in r["txs"])
           for r in renested.collect()}
    want = {b["hash"]: sorted(json.dumps(t, sort_keys=True)
                              for t in b["transactions"])
            for b in blocks if b["transactions"]}
    # explode drops blocks with zero transactions; collect can't resurrect
    # them — that asymmetry is the documented explode semantics.
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(min_value=-10**6, max_value=10**6),
                min_size=1, max_size=50))
def test_decimal_sum_order_independent(spark, xs):
    """The numeric-determinism contract: decimal-routed sums are invariant
    under partitioning/ordering (the reason every money aggregate casts
    to decimal before summing — SURVEY.md §7 watch-list)."""
    vals = [(float(x) / 100.0,) for x in xs]
    df = spark.createDataFrame(vals, "x double")
    one = df.coalesce(1).agg(
        F.sum(F.col("x").cast("decimal(18,4)")).cast("double")).collect()[0][0]
    many = df.repartition(7).agg(
        F.sum(F.col("x").cast("decimal(18,4)")).cast("double")).collect()[0][0]
    assert one == many


def test_transaction_schema_matches_wire_fields():
    """TRANSACTION_SCHEMA mirrors the reference wire struct field-for-field
    (schemas/evm.rs:34-47 → SURVEY.md §1.2 mapping)."""
    assert [f.name for f in TRANSACTION_SCHEMA.fields] == [
        "tx_hash", "block_number", "transaction_index", "from_address",
        "to_address", "value", "gas_price", "gas", "input", "nonce"]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.floats(min_value=-10.0, max_value=10.0, width=32,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=64))
def test_int8_quantization_error_bound(spark, vec):
    """op_embedding_quantize's absmax-int8 scheme: every reconstructed
    component must sit within half a quantization step (scale/254) of
    the original, and |q| never exceeds 127 — on arbitrary float32
    vectors, not just the fixture."""
    df = spark.createDataFrame([(vec,)], "v array<float>")
    row = (df.withColumn("sc", F.expr(
               "array_max(transform(v, x -> abs(CAST(x AS DOUBLE))))"))
             .withColumn("q", F.expr("""
                 transform(v, x -> CASE WHEN sc = 0D THEN 0L
                   ELSE CAST(floor(CAST(x AS DOUBLE) / sc * 127.0 + 0.5)
                             AS BIGINT) END)"""))
             .collect()[0])
    sc = row["sc"]
    assert all(abs(q) <= 127 for q in row["q"])
    if sc > 0:
        step = sc / 127.0
        for x, q in zip(vec, row["q"]):
            assert abs(float(x) - q * step) <= step / 2 + 1e-9 * sc


def test_merkle_root_sensitivity_and_order_invariance(spark, sf_dir):
    """op_merkle_root's commitment contract, both directions: (a) the
    root is INSENSITIVE to physical row order (leaves are committed by
    their orderkey index through the index-ORDERED child concat, so a
    full shuffle of the input changes nothing); (b) the root is
    SENSITIVE to any single-cell corruption (one order's price bumped
    one unit flips the root — one CENT can vanish in the double
    floor((p+0.01)·100), which is why the leaf hashes integer cents
    in the first place). The table-checksum key pins the same
    pair for the commutative sum; this is the tree's version."""
    from .oracle import spill_connect

    from blockchain_data_ingestion_spark.queries.analytics import (
        _MERKLE_DUCK_SQL)

    con = spill_connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{sf_dir}/orders.parquet')")
    base = con.execute(_MERKLE_DUCK_SQL).fetchone()[0]

    con2 = spill_connect()
    con2.execute(f"""CREATE VIEW orders AS
        SELECT * FROM read_parquet('{sf_dir}/orders.parquet')
        ORDER BY md5(CAST(o_orderkey AS VARCHAR))""")  # physical shuffle
    assert con2.execute(_MERKLE_DUCK_SQL).fetchone()[0] == base

    con3 = spill_connect()
    con3.execute(f"""CREATE VIEW orders AS
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderkey = (SELECT min(o_orderkey) FROM
                      read_parquet('{sf_dir}/orders.parquet'))
                    THEN o_totalprice + 1.0 ELSE o_totalprice END
                 AS o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{sf_dir}/orders.parquet')""")
    assert con3.execute(_MERKLE_DUCK_SQL).fetchone()[0] != base


def test_time_decay_attribution_conserves_credit(spark, sf_dir):
    """Per (user, conversion-day), the nano-credits handed to its
    touch-day cells must sum to n_convs·1e9 minus at most |cells|
    floor-dust — the conservation invariant the registered key's
    milli rollup is built on (violated conservation means
    double-counted or lost conversions)."""
    from .oracle import spill_connect

    con = spill_connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    rows = con.execute("""
    WITH e AS (
      SELECT user_id, event_type,
             (epoch_us(ts) // 1000000) // 86400 AS day FROM events),
    conv AS (
      SELECT user_id, day AS cday, CAST(count(*) AS BIGINT) AS n_convs
      FROM e WHERE event_type = 'purchase' GROUP BY user_id, day),
    tch AS (
      SELECT user_id, day AS tday, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM e WHERE event_type <> 'purchase'
      GROUP BY user_id, day, event_type),
    pair AS (
      SELECT c.user_id, c.cday, c.n_convs,
             CAST(t.n * (CAST(1 AS BIGINT)
                         << (7 - (c.cday - t.tday)))
               AS BIGINT) AS w
      FROM conv c JOIN tch t ON t.user_id = c.user_id
      WHERE t.tday <= c.cday AND t.tday > c.cday - 8),
    tot AS (SELECT user_id, cday, CAST(sum(w) AS BIGINT) AS wtot,
                   CAST(count(*) AS BIGINT) AS n_cells FROM pair
            GROUP BY user_id, cday)
    SELECT p.user_id, p.cday, max(p.n_convs) AS n_convs,
           max(t.n_cells) AS n_cells,
           CAST(sum(CAST(floor(1000000000.0 * p.n_convs * p.w / t.wtot)
                         AS BIGINT)) AS BIGINT) AS nano
    FROM pair p JOIN tot t ON t.user_id = p.user_id AND t.cday = p.cday
    GROUP BY p.user_id, p.cday
    """).fetchall()
    assert rows, "no conversions with touches at this SF"
    for user_id, cday, n_convs, n_cells, nano in rows:
        target = n_convs * 1_000_000_000
        assert target - n_convs * n_cells <= nano <= target, \
            (user_id, cday, n_convs, n_cells, nano)


def test_edit_distance_matches_pure_python_dp(spark, sf_dir):
    """The engines' levenshtein() on every blocked pair must equal a
    pure-Python reference DP — pinning that 'levenshtein is the same
    exact integer DP on both engines' is a fact, not an assumption."""
    from .oracle import spill_connect

    from blockchain_data_ingestion_spark.queries.llm_text import (
        _EDITDIST_DUCK_SQL)

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    con = spill_connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    pairs = con.execute(_EDITDIST_DUCK_SQL).fetchall()
    texts = dict(con.execute(
        "SELECT doc_id, text FROM documents").fetchall())
    assert pairs
    for doc_a, doc_b, edit_dist, _, _, _ in pairs:
        assert lev(texts[doc_a], texts[doc_b]) == edit_dist, \
            (doc_a, doc_b)


def test_peak_concurrency_matches_bruteforce_sweep(spark, sf_dir):
    """The registered key's (day, peak) table must equal a brute-force
    per-instant sweep of the same sessionized intervals — the pin the
    r11 review-pass-2 fixes were verified against (same-second ties,
    carry-into-day, delta-less days), kept as a permanent test."""
    from collections import defaultdict
    from itertools import groupby

    from .oracle import spill_connect

    from blockchain_data_ingestion_spark.queries.analytics import (
        _CONC_DUCK_SQL, _conc_iv_sql)

    con = spill_connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    got = {r[0]: (r[1], r[2]) for r in
           con.execute(_CONC_DUCK_SQL).fetchall()}
    iv = con.execute(_conc_iv_sql("epoch_us(ts) // 1000000")).fetchall()
    ev = []
    for _, _, s, e in iv:
        ev.append((s, 1))
        ev.append((e + 1, -1))
    ev.sort()
    days = sorted({t // 86400 for t, _ in ev})
    lo, hi = days[0], days[-1]
    level, prev_day = 0, lo
    day_max = {d: 0 for d in range(lo, hi + 1)}
    for t, grp in groupby(ev, key=lambda x: x[0]):
        d = t // 86400
        for dd in range(prev_day, min(d, hi) + 1):
            day_max[dd] = max(day_max[dd], level)
        level += sum(x[1] for x in grp)
        if d <= hi:
            day_max[d] = max(day_max[d], level)
        prev_day = d
    starts = defaultdict(int)
    for _, _, s, e in iv:
        starts[s // 86400] += 1
    assert set(got) == set(range(lo, hi + 1))
    for d in range(lo, hi + 1):
        assert got[d] == (day_max[d], starts.get(d, 0)), d


def test_sax_symbols_shape(spark, sf_dir):
    """Every SAX string has exactly n symbols drawn from {a,b,c,d} —
    the discretization contract downstream motif tooling assumes."""
    import re

    from blockchain_data_ingestion_spark.queries import load_all

    rows = load_all()["op_sax_symbols"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert len(r["sax"]) == r["n"], r["user_id"]
        assert re.fullmatch(r"[abcd]+", r["sax"]), r["user_id"]


def test_drawdown_negative_series_no_phantom_zero_peak(spark):
    """op_drawdown's first-bucket carry must coalesce to the row's own
    local running max, not 0 (ADVICE r11): on an all-negative series
    the peak is the series' own (negative) high-water mark, and a
    phantom 0 peak would inflate every drawdown by |peak|. Brute-force
    per-row running max over a constructed two-type fixture, with rows
    placed in BOTH the first and a later carry bucket."""
    from blockchain_data_ingestion_spark import catalog as _cat
    from blockchain_data_ingestion_spark.queries.analytics import (
        _DD_BKT, _dd_sql)

    rows = []
    series = {
        "neg": [(-5.00), (-2.00), (-9.50), (-1.25), (-7.00)],
        "mix": [3.00, (-4.00), 1.50, (-0.75)],
    }
    for et, vals in series.items():
        for i, v in enumerate(vals):
            # straddle the bucket boundary: last two rows land in bkt 1
            eid = i if i < len(vals) - 2 else _DD_BKT + i
            rows.append((et, eid, v))
    df = spark.createDataFrame(rows, "event_type string, event_id long,"
                                     " value double")
    df.createOrReplaceTempView("events")
    try:
        got = {r["event_type"]: (r["max_drawdown_cents"], r["n_obs"])
               for r in spark.sql(_dd_sql("div")).collect()}
    finally:
        spark.catalog.dropTempView("events")
        _cat._VIEWS_FOR.pop(spark, None)
    import math
    for et, vals in series.items():
        cents = [int(math.floor(v * 100)) for v in vals]
        rm, best = None, None
        for c in cents:
            rm = c if rm is None else max(rm, c)
            dd = rm - c
            best = dd if best is None else max(best, dd)
        assert got[et] == (best, len(cents)), (et, got[et], best)
    # non-vacuity: the all-negative type's true answer differs from the
    # phantom-0-peak answer (which would be 0 - min = 950)
    assert got["neg"][0] == 750 and got["neg"][0] != 950


def test_label_propagation_matches_bruteforce_with_ties(spark):
    """op_label_propagation's DataFrame vote loop against a Python
    reference on a constructed co-purchase graph — now that the Spark
    SQL twin is gone (r12), this pins the loop's algebra independently
    of the DuckDB oracle: 3 SYNCHRONOUS rounds (all votes read the
    previous round's labels), most-frequent neighbor label, ties to the
    SMALLEST label. The fixture plants a genuine tie (node 5 sees one
    vote each from two communities) so the tie-break arm is exercised,
    plus a 4-clique and a triangle bridged by a single edge that LPA
    must NOT merge."""
    from collections import Counter

    from blockchain_data_ingestion_spark import catalog as _cat
    from blockchain_data_ingestion_spark.queries import load_all

    # co-purchase orders: suppliers sharing >=2 high-qty orders get an
    # edge. Build order sets per intended edge.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # 4-clique
             (5, 6), (5, 7), (6, 7),                          # triangle
             (4, 5)]                                          # bridge
    rows, ok = [], 0
    for a, b in edges:
        for _ in range(2):                     # >=2 shared orders
            ok += 1
            rows.append((ok, a, 50.0))
            rows.append((ok, b, 50.0))
    import tempfile

    df = spark.createDataFrame(
        rows, "l_orderkey long, l_suppkey long, l_quantity double")
    with tempfile.TemporaryDirectory(prefix="lpa_fixture_") as d:
        # catalog.table reads {sf_dir}/lineitem.parquet (single file)
        df.toPandas().to_parquet(f"{d}/lineitem.parquet")
        got = {r["community"]: r["n_nodes"]
               for r in load_all()["op_label_propagation"]
               .spark(spark, d).collect()}
    _cat._SCAN_CACHE.pop((spark, d, "lineitem"), None)

    # Python reference: 3 synchronous rounds over the symmetric graph
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lab = {n: n for n in adj}
    tie_seen = False
    for _ in range(3):
        nxt = {}
        for n, nbrs in adj.items():
            c = Counter(lab[m] for m in nbrs)
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            tie_seen |= sum(1 for v in c.values() if v == best[1]) > 1
            nxt[n] = best[0]
        lab = nxt
    assert tie_seen, "fixture never exercised the tie-break arm"
    want = Counter(lab.values())
    assert got == dict(want), (got, dict(want))
    # non-vacuity: the bridge must not have merged everything
    assert len(got) >= 2, got
