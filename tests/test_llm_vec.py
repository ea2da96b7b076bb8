"""Vector/embedding operator contracts that the SQL oracle cannot see:
the above-cap auto-switch of `dedup_embedding_cosine` (the oracle only
ever runs below the cap) and its hash-equality with the LSH key.
"""

from __future__ import annotations

from blockchain_data_ingestion_spark.queries import llm_vec, load_all


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cosine_dedup_auto_switches_past_cap(spark, sf_dir, monkeypatch):
    """Above `_COSINE_MAX_PAIR_WORK` the all-pairs plan must NOT run
    (and must not raise): the op degrades to the LSH candidate+rerank
    plan and returns the identical top-50 report the
    `dedup_embedding_lsh` key produces on the same corpus. Lowering the
    cap below the fixture's pair work makes the fixture an 'above-cap
    corpus' without generating a terabyte parquet."""
    import warnings

    monkeypatch.setattr(llm_vec, "_COSINE_MAX_PAIR_WORK", 1)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        over_cap = load_all()["dedup_embedding_cosine"].spark(spark, sf_dir)
    # The degradation is explicit (ADVICE r5): exactly one RuntimeWarning
    # names the switch so approximate runs are distinguishable.
    switch_warns = [w for w in caught if issubclass(w.category, RuntimeWarning)
                    and "auto-switching" in str(w.message)]
    assert len(switch_warns) == 1
    lsh = load_all()["dedup_embedding_lsh"].spark(spark, sf_dir)
    assert over_cap.columns == lsh.columns
    assert _rows(over_cap) == _rows(lsh)


def test_cosine_dedup_switch_point_is_exact_pair_work(spark, sf_dir,
                                                      monkeypatch):
    """Pin the cost-gate's SWITCH POINT (VERDICT r14 item 1: the gate
    must be work-based — n·(n−1)/2 × dims, footer-derived — not a raw
    row cap): with the cap set to exactly the fixture's own pair work
    the exact plan runs (no warning); one unit below, the op switches.
    This nails both the formula and the strict-> comparison, so a
    refactor that silently changes either moves a measured boundary
    and fails here."""
    import warnings

    from blockchain_data_ingestion_spark.catalog import (
        table_list_dim, table_row_count)

    n = table_row_count(sf_dir, "embeddings")
    dims = table_list_dim(sf_dir, "embeddings", "embedding")
    assert dims == 64, "fixture embeddings are 64-dim; probe disagrees"
    work = n * (n - 1) // 2 * dims

    def run_with_cap(cap):
        monkeypatch.setattr(llm_vec, "_COSINE_MAX_PAIR_WORK", cap)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            load_all()["dedup_embedding_cosine"].spark(spark, sf_dir)
        return [w for w in caught
                if issubclass(w.category, RuntimeWarning)
                and "auto-switching" in str(w.message)]

    assert run_with_cap(work) == []           # at the cap: exact plan
    assert len(run_with_cap(work - 1)) == 1   # one below: LSH switch


def test_cosine_dedup_below_cap_is_exact_all_pairs(spark, sf_dir):
    """Below the cap the exact block plan still runs (regression guard:
    the auto-switch must not become always-on): at fixture scale the
    exact top-1 pair's cosine is >= the LSH candidate top-1 (bucket
    pruning can only lose pairs, never invent better ones)."""
    exact = load_all()["dedup_embedding_cosine"].spark(spark, sf_dir)
    lsh = load_all()["dedup_embedding_lsh"].spark(spark, sf_dir)
    top_exact = exact.limit(1).collect()[0]["cosine"]
    top_lsh = lsh.limit(1).collect()[0]["cosine"]
    assert top_exact >= top_lsh


def test_cosine_dedup_cap_probe_runs_no_spark_job(spark, sf_dir):
    """The `_COSINE_MAX_PAIR_WORK` cap probe reads parquet footers, not the
    cluster: BUILDING the plan must launch zero Spark jobs. The eager
    ``e.count()`` it replaced was a full corpus scan spent deciding
    which plan to run (VERDICT r13 item 5) — at 100 TB that probe costs
    more than many of the queries it gates."""
    from blockchain_data_ingestion_spark.catalog import (table,
                                                         table_row_count)

    # Warm the scan cache so the probe measures the operator build, not
    # first-touch table setup (layout shim, schema inference).
    emb = table(spark, sf_dir, "embeddings")
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    load_all()["dedup_embedding_cosine"].spark(spark, sf_dir)
    after = set(tracker.getJobIdsForGroup(None))
    assert after == before, (
        "plan build launched Spark job(s) — eager cap probe regressed")
    # The footer sum must BE COUNT(*) (exact, not an estimate), and a
    # missing table must signal fallback rather than guess.
    assert table_row_count(sf_dir, "embeddings") == emb.count()
    assert table_row_count(sf_dir, "no_such_table") is None


def test_pq_self_code_is_adc_minimum(spark, sf_dir):
    """PQ invariant: a vector's own code minimizes ADC distance over
    ALL possible codes (encode takes the per-subspace argmin, and ADC
    sums per-subspace terms) — so for every query, the ADC distance to
    its own code must lower-bound the distance to every corpus code.
    This pins encode and search to the SAME codebook arithmetic."""
    from pyspark.sql import functions as F

    from blockchain_data_ingestion_spark.queries.llm_vec import (
        _pq_adist_spark, _pq_code_spark)

    e = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
         .limit(40)
         .select("vec_id", "embedding",
                 F.expr(f"CAST({_pq_code_spark('embedding')} AS BIGINT)")
                  .alias("own_code")))
    selfd = {r["vec_id"]: r["d"] for r in e.select(
        "vec_id",
        F.expr(f"CAST({_pq_adist_spark('embedding', 'own_code')}"
               " AS BIGINT)").alias("d")).collect()}
    a = e.select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qe"))
    b = e.select(F.col("vec_id").alias("nid"),
                 F.col("own_code").alias("code"))
    cross = a.crossJoin(b).select(
        "qid", "nid",
        F.expr(f"CAST({_pq_adist_spark('qe', 'code')} AS BIGINT)")
         .alias("d"))
    for r in cross.collect():
        assert selfd[r["qid"]] <= r["d"], (r["qid"], r["nid"])


def test_cogroup_reconcile_matches_independent_python_replay(spark, sf_dir):
    """Replay-twin oracle for the greedy wallet-funding fold: an
    INDEPENDENT straight-line python implementation (raw rows via
    duckdb, no pandas groupby, no shared code with the kernel) must
    reproduce the Spark cogroup output exactly — and the fixture must
    exercise BOTH branches (some orders funded, some skipped), or the
    conditional-consume semantics aren't actually being tested."""
    from .oracle import spill_connect

    from blockchain_data_ingestion_spark.queries.llm_vec import (
        _RECONCILE_CREDIT_MULT)

    con = spill_connect()
    orders = con.execute(
        "SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT),"
        "       CAST(o_orderdate AS DATE), o_orderkey"
        f" FROM read_parquet('{sf_dir}/orders.parquet')"
        " WHERE o_custkey < 150"
        " ORDER BY o_custkey, CAST(o_orderdate AS DATE), o_orderkey"
    ).fetchall()
    events = con.execute(
        "SELECT user_id, CAST(round(value * 100) AS BIGINT)"
        f" FROM read_parquet('{sf_dir}/events.parquet')"
        " WHERE user_id < 150").fetchall()
    wallets: dict = {}
    for uid, cents in events:
        wallets[uid] = wallets.get(uid, 0) + cents * _RECONCILE_CREDIT_MULT
    state = {ck: [0, 0, w] for ck, w in wallets.items()}
    for ck, price, _d, _k in orders:          # already replay-ordered
        st = state.setdefault(ck, [0, 0, 0])
        st[0] += 1
        if price <= st[2]:
            st[1] += 1
            st[2] -= price
    expected = sorted((ck, st[0], st[1], st[2])
                      for ck, st in state.items())
    got = [tuple(r) for r in
           load_all()["udf_cogroup_reconcile"].spark(spark, sf_dir)
           .collect()]
    assert got == expected
    funded = sum(r[2] for r in got)
    total = sum(r[1] for r in got)
    assert 0 < funded < total, (funded, total)  # both branches exercised


def test_hard_negatives_output_is_total_with_flagged_fallbacks(spark, sf_dir):
    """No vector may vanish from the mining output (r5 gap: vectors in
    buckets with no other-label neighbor silently dropped). The fixture
    naturally plants singleton/single-label buckets, so: every corpus
    vec_id appears exactly once, at least one row is the hash-picked
    fallback, and no row — mined or fallback — pairs a vector with its
    own label."""
    out = load_all()["op_hard_negatives"].spark(spark, sf_dir).collect()
    corpus_ids = {r["vec_id"] for r in
                  spark.read.parquet(f"{sf_dir}/embeddings.parquet")
                  .select("vec_id").collect()}
    assert {r["vec_id"] for r in out} == corpus_ids
    assert len(out) == len(corpus_ids)              # exactly once
    assert any(r["is_fallback"] for r in out)       # fallback exercised
    assert any(not r["is_fallback"] for r in out)   # mining exercised
    for r in out:
        assert r["label"] != r["neg_label"], r
        assert r["vec_id"] != r["hard_neg_id"], r


def test_pq_lut_path_is_bit_identical_and_gated(spark, sf_dir):
    """The per-query LUT rewrite must be pure regrouping: for every
    (query, code) pair the LUT distance equals the direct ADC distance
    exactly (integer associativity). And the op must actually take the
    LUT branch above `_PQ_LUT_MIN_QUERIES` (plan shows element_at) and
    the direct branch below."""
    from pyspark.sql import functions as F

    from blockchain_data_ingestion_spark.queries.llm_vec import (
        _pq_adist_lut_spark, _pq_adist_spark, _pq_code_spark,
        _pq_lut_spark)

    e = (spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(30)
         .select("vec_id", "embedding",
                 F.expr(f"CAST({_pq_code_spark('embedding')} AS BIGINT)")
                  .alias("code"),
                 F.expr(_pq_lut_spark("embedding")).alias("lut")))
    qs = e.select(F.col("vec_id").alias("qid"),
                  F.col("embedding").alias("qe"), "lut").limit(6)
    cs = e.select(F.col("vec_id").alias("nid"), "code")
    both = qs.crossJoin(cs).select(
        "qid", "nid",
        F.expr(f"CAST({_pq_adist_spark('qe', 'code')} AS BIGINT)")
         .alias("direct"),
        F.expr(f"CAST({_pq_adist_lut_spark('lut', 'code')} AS BIGINT)")
         .alias("via_lut"))
    for r in both.collect():
        assert r["direct"] == r["via_lut"], (r["qid"], r["nid"])

    # branch gating: fixture has 10 queries >= threshold -> LUT plan
    op = load_all()["op_ann_pq_search"].spark(spark, sf_dir)
    assert "element_at" in op._jdf.queryExecution().executedPlan().toString()


def test_reconcile_kernel_property_matches_plain_fold():
    """Hypothesis property for the greedy wallet kernel itself (no
    Spark): random interleavings of orders/credits — including the
    price == balance boundary (funded, balance hits exactly zero),
    zero-credit customers, one-sided customers, and unsorted input
    frames — must match an independent plain-python fold."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from blockchain_data_ingestion_spark.queries.llm_vec import _reconcile

    orders_st = st.lists(
        st.tuples(st.integers(0, 5),            # custkey
                  st.integers(0, 40),           # price (small: boundary hits)
                  st.integers(0, 6),            # date_int
                  st.integers(0, 100)),         # orderkey
        max_size=25, unique_by=lambda t: t[3])
    events_st = st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 30)), max_size=15)

    @given(orders=orders_st, events=events_st)
    @settings(max_examples=200, deadline=None)
    def check(orders, events):
        opdf = pd.DataFrame(orders, columns=["custkey", "price_cents",
                                             "date_int", "o_orderkey"])
        epdf = pd.DataFrame(events, columns=["custkey", "credit_cents"])
        got = {int(r.custkey): (int(r.n_orders), int(r.n_funded),
                                int(r.residual_cents))
               for r in _reconcile((0,), opdf, epdf)
               .itertuples(index=False)}
        wallets: dict = {}
        for ck, c in events:
            wallets[ck] = wallets.get(ck, 0) + c
        st8 = {ck: [0, 0, w] for ck, w in wallets.items()}
        for ck, price, _d, _k in sorted(orders, key=lambda t: (t[0], t[2],
                                                               t[3])):
            s = st8.setdefault(ck, [0, 0, 0])
            s[0] += 1
            if price <= s[2]:
                s[1] += 1
                s[2] -= price
        assert got == {ck: tuple(v) for ck, v in st8.items()}

    check()
