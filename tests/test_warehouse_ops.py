"""Warehouse (TPC-H-shaped) and new corpus driver queries: invariants,
python twins, and plan-shape assertions. Value parity vs DuckDB runs in
the driver gate / tools/check_correctness.py; these tests pin the
semantics and the physical plans."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from healthcare_aws_data_engineering_spark.plans.corpus_queries import (
    IMP_GRID,
    IMP_HALF_CHARS,
    q_importance_sample,
    q_shingle_novelty,
    q_word_bigrams,
)
from healthcare_aws_data_engineering_spark.plans.warehouse_queries import (
    BRACKETS,
    LO_MIN_QTY,
    RET_TOP_K,
    q_bracket_revenue,
    q_cube_summary,
    q_dormant_customers,
    q_large_orders,
    q_nation_trade,
    q_order_priority,
    q_promo_revenue,
    q_returned_items,
    q_revenue_share,
    q_set_ops,
)
from healthcare_aws_data_engineering_spark.sources.tables import load_table

from conftest import plan_string

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------- TPC-H shapes


def test_order_priority_is_semi_join(spark):
    df = q_order_priority(spark, SF_DIR)
    plan = plan_string(df)
    assert "LeftSemi" in plan, plan  # EXISTS must not fan out
    rows = df.collect()
    prios = {r["o_orderpriority"] for r in rows}
    assert prios <= {"1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"}
    assert all(r["n_late_orders"] > 0 for r in rows)


def test_returned_items_topk_ordered(spark):
    rows = q_returned_items(spark, SF_DIR).collect()
    assert len(rows) <= RET_TOP_K
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert all(r["revenue"] > 0 for r in rows)


def test_nation_trade_bounded_and_positive(spark):
    rows = q_nation_trade(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 25 * 25
    assert all(r["revenue"] > 0 and r["n_lineitems"] > 0 for r in rows)


def test_promo_revenue_ratio_bounds(spark):
    row = q_promo_revenue(spark, SF_DIR).collect()[0]
    assert 0.0 <= row["promo_pct"] <= 100.0
    assert row["promo_revenue"] <= row["total_revenue"]


def test_large_orders_threshold(spark):
    rows = q_large_orders(spark, SF_DIR).collect()
    assert all(r["total_qty"] > LO_MIN_QTY for r in rows)
    # cross-check one order's quantity sum from the base table
    if rows:
        k = rows[0]["o_orderkey"]
        li = load_table(spark, SF_DIR, "lineitem")
        s = li.filter(F.col("l_orderkey") == k).agg(
            F.sum("l_quantity").cast("bigint").alias("s")
        ).collect()[0]["s"]
        assert s == rows[0]["total_qty"]


def test_bracket_revenue_matches_manual_filter(spark):
    row = q_bracket_revenue(spark, SF_DIR).collect()[0]
    li = load_table(spark, SF_DIR, "lineitem")
    part = load_table(spark, SF_DIR, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    n = 0
    for brand, size_hi, qlo, qhi in BRACKETS:
        n += j.filter(
            (F.col("p_brand") == brand)
            & (F.col("p_size").between(1, size_hi))
            & (F.col("l_quantity").between(qlo, qhi))
        ).count()
    assert n == row["n_lineitems"]


def test_dormant_customers_anti_join_plan(spark):
    df = q_dormant_customers(spark, SF_DIR)
    plan = plan_string(df)
    assert "LeftAnti" in plan, plan
    rows = df.collect()
    assert all(r["n_dormant"] > 0 for r in rows)
    # every counted customer beats the positive-balance average, so the
    # per-nation sum must exceed n_dormant * 0 at minimum — and no
    # nation can report more dormant customers than it has customers
    cust = load_table(spark, SF_DIR, "customer")
    per_nation = dict(
        cust.groupBy("c_nationkey").count().rdd.map(tuple).collect()
    )
    assert all(r["n_dormant"] <= per_nation[r["c_nationkey"]] for r in rows)


def test_set_ops_counts_consistent(spark):
    rows = {r["relation"]: r["n_user_days"] for r in q_set_ops(spark, SF_DIR).collect()}
    assert set(rows) == {"click_only", "both", "purchase_only"}
    # |A| = |A\\B| + |A∩B| against an independent distinct count
    events = load_table(spark, SF_DIR, "events")
    a = (
        events.filter(F.col("event_type") == "click")
        .select("user_id", F.expr("unix_millis(ts) DIV 86400000").alias("day"))
        .distinct()
        .count()
    )
    assert rows["click_only"] + rows["both"] == a


def test_revenue_share_sums_to_one_per_region(spark):
    rows = q_revenue_share(spark, SF_DIR).collect()
    by_region = {}
    for r in rows:
        by_region.setdefault(r["r_name"], []).append(r["region_share"])
    for shares in by_region.values():
        assert abs(sum(shares) - 1.0) < 1e-9
        assert all(0.0 < s <= 1.0 for s in shares)


def test_cube_summary_lattice_consistent(spark):
    rows = q_cube_summary(spark, SF_DIR).collect()
    total = [r for r in rows if r["g_status"] == 1 and r["g_priority"] == 1]
    assert len(total) == 1
    fine = [r for r in rows if r["g_status"] == 0 and r["g_priority"] == 0]
    assert sum(r["n_orders"] for r in fine) == total[0]["n_orders"]
    by_status = [r for r in rows if r["g_status"] == 0 and r["g_priority"] == 1]
    assert sum(r["n_orders"] for r in by_status) == total[0]["n_orders"]
    assert all(
        r["orderpriority"] == "ALL" for r in by_status
    )


def test_rank_windows_invariants(spark):
    from healthcare_aws_data_engineering_spark.plans.warehouse_queries import (
        q_rank_windows,
    )

    rows = q_rank_windows(spark, SF_DIR).collect()
    assert rows
    by_group = {}
    for r in rows:
        assert 1 <= r["quartile"] <= 4
        assert 0.0 <= r["pct_rnk"] <= 1.0
        assert 0.0 < r["cume"] <= 1.0
        assert r["dense_rnk"] <= r["rnk"]
        by_group.setdefault((r["c_nationkey"], r["bal_band"]), set()).add(r["rnk"])
    # ties on the coarse key share the rank
    assert all(len(v) == 1 for v in by_group.values())


def test_gap_fill_spine_and_forward_fill(spark):
    from healthcare_aws_data_engineering_spark.plans.warehouse_queries import (
        q_gap_fill,
    )

    rows = sorted(
        q_gap_fill(spark, SF_DIR).collect(),
        key=lambda r: (r["user_id"], r["day"]),
    )
    assert rows
    assert any(r["observed"] == 0 for r in rows)  # gaps exist at this SF
    last_by_user = {}
    days_by_user = {}
    for r in rows:
        u = r["user_id"]
        days_by_user.setdefault(u, []).append(r["day"])
        if r["observed"]:
            last_by_user[u] = r["v_filled"]
        else:
            # forward fill carries the last observed value verbatim
            assert r["v_filled"] == last_by_user[u]
    for days in days_by_user.values():
        assert days == list(range(days[0], days[-1] + 1))  # contiguous spine
        assert len(days) >= 1


def test_basket_pairs_python_twin(spark):
    from collections import Counter
    from itertools import combinations

    from healthcare_aws_data_engineering_spark.plans.warehouse_queries import (
        q_basket_pairs,
    )

    events = load_table(spark, SF_DIR, "events").select(
        "user_id", F.expr("unix_millis(ts) DIV 86400000").alias("day"), "event_type"
    ).collect()
    baskets = {}
    for r in events:
        baskets.setdefault((r["user_id"], r["day"]), set()).add(r["event_type"])
    counts = Counter()
    for items in baskets.values():
        for a, b in combinations(sorted(items), 2):
            counts[(a, b)] += 1
    got = {
        (r["item_a"], r["item_b"]): r["support"]
        for r in q_basket_pairs(spark, SF_DIR).collect()
    }
    assert got == dict(counts)


def test_attribution_last_touch_semantics(spark):
    from healthcare_aws_data_engineering_spark.plans.warehouse_queries import (
        q_attribution,
    )

    rows = q_attribution(spark, SF_DIR).collect()
    assert rows
    assert all(r["attributed_to"] != "purchase" for r in rows)
    assert all(r["gap_ms"] > 0 or r["attributed_to"] == "none" for r in rows)
    # python twin for one user
    uid = rows[0]["user_id"]
    evs = sorted(
        load_table(spark, SF_DIR, "events")
        .filter(F.col("user_id") == uid)
        .select("event_id", "event_type", F.expr("unix_millis(ts)").alias("ms"))
        .collect(),
        key=lambda r: (r["ms"], r["event_id"]),
    )
    expected = {}
    last = None
    for r in evs:
        if r["event_type"] == "purchase":
            expected[r["event_id"]] = (
                (last["event_type"], r["ms"] - last["ms"]) if last else ("none", -1)
            )
        else:
            last = r
    got = {
        r["event_id"]: (r["attributed_to"], r["gap_ms"])
        for r in rows
        if r["user_id"] == uid
    }
    assert got == expected


def test_event_paths_python_twin(spark):
    from collections import Counter

    from healthcare_aws_data_engineering_spark.plans.pipeline_queries import (
        PATH_TOP_K,
        SESSION_GAP_MS,
        q_event_paths,
    )

    evs = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "event_type", F.unix_millis("ts").alias("ms")
    ).collect()
    by_user = {}
    for r in evs:
        by_user.setdefault(r["user_id"], []).append(r)
    counts = Counter()
    for rows in by_user.values():
        rows.sort(key=lambda r: (r["ms"], r["event_id"]))
        session, prev_ms = [], None
        sessions = []
        for r in rows:
            if prev_ms is not None and r["ms"] - prev_ms > SESSION_GAP_MS:
                sessions.append(session)
                session = []
            session.append(r["event_type"])
            prev_ms = r["ms"]
        sessions.append(session)
        for types in sessions:
            for i in range(len(types) - 2):
                counts[">".join(types[i : i + 3])] += 1
    expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:PATH_TOP_K]
    got = [(r["path"], r["n"]) for r in q_event_paths(spark, SF_DIR).collect()]
    assert got == expected


def test_profile_columns_single_pass_and_values(spark):
    from healthcare_aws_data_engineering_spark.plans.warehouse_queries import (
        PROFILE_COLS,
        q_profile_columns,
    )
    from conftest import n_exchanges, plan_string

    df = q_profile_columns(spark, SF_DIR)
    # one partial+final agg pair over one scan — no per-column passes
    assert n_exchanges(plan_string(df)) <= 1
    rows = {r["column_name"]: r for r in df.collect()}
    assert set(rows) == set(PROFILE_COLS)
    li = load_table(spark, SF_DIR, "lineitem")
    n = li.count()
    for c in PROFILE_COLS:
        r = rows[c]
        assert r["n_rows"] == n and r["n_nulls"] == 0
        assert r["min_v"] <= r["mean_v"] <= r["max_v"]
        mn, mx = li.agg(F.min(c), F.max(c)).collect()[0]
        assert (r["min_v"], r["max_v"]) == (mn, mx)


# ------------------------------------------------------------- corpus ops


def test_word_bigrams_python_twin(spark):
    docs = load_table(spark, SF_DIR, "documents").select("text").collect()
    from collections import Counter

    counts = Counter()
    for r in docs:
        ws = r["text"].split(" ")
        for i in range(len(ws) - 1):
            counts[ws[i] + " " + ws[i + 1]] += 1
    expected = sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[:100]
    got = [
        (r["bigram"], r["cnt"]) for r in q_word_bigrams(spark, SF_DIR).collect()
    ]
    assert got == expected


def test_shingle_novelty_bounds_and_first_doc(spark):
    rows = q_shingle_novelty(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["novel_shingles"] <= r["total_shingles"]
        assert 0.0 <= r["novelty_rate"] <= 1.0
    # the lowest doc_id in the result can only contain first-occurrence
    # shingles (nothing precedes it)
    lo = min(r["doc_id"] for r in rows)
    first = next(r for r in rows if r["doc_id"] == lo)
    assert first["novel_shingles"] == first["total_shingles"]


def test_ppjoin_exactness_vs_brute_force(spark):
    """The prefix filter must lose NOTHING: verified output == the
    all-pairs brute-force result (same toks, no candidate pruning)."""
    from healthcare_aws_data_engineering_spark.operators.ppjoin import (
        PPJ_SHINGLE_W,
        PPJ_T100,
        _shingles,
        prefix_jaccard_join,
    )

    docs = load_table(spark, SF_DIR, "documents")
    got = sorted(
        (r["a_id"], r["b_id"], r["shared"], r["union_sz"])
        for r in prefix_jaccard_join(docs).collect()
    )
    toks = (
        docs.select("doc_id", F.split("text", " ").alias("__ws"))
        .filter(F.size("__ws") >= PPJ_SHINGLE_W)
        .select("doc_id", F.explode(_shingles(PPJ_SHINGLE_W)).alias("tok"))
    )
    a = toks.select(F.col("doc_id").alias("a_id"), "tok")
    b = toks.select(F.col("doc_id").alias("b_id"), "tok")
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        a.join(b, "tok")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    brute = (
        inter.join(sizes.select(F.col("doc_id").alias("a_id"), F.col("sz").alias("sa")), "a_id")
        .join(sizes.select(F.col("doc_id").alias("b_id"), F.col("sz").alias("sb")), "b_id")
        .withColumn("union_sz", F.col("sa") + F.col("sb") - F.col("shared"))
        .filter(F.col("shared") * 100 >= F.col("union_sz") * PPJ_T100)
    )
    expected = sorted(
        (r["a_id"], r["b_id"], r["shared"], r["union_sz"])
        for r in brute.collect()
    )
    assert got == expected
    assert got  # planted near-dups exist at every SF


def test_ppjoin_threshold_and_ordering(spark):
    from healthcare_aws_data_engineering_spark.operators.ppjoin import (
        prefix_jaccard_join,
    )

    docs = load_table(spark, SF_DIR, "documents")
    rows = prefix_jaccard_join(docs).collect()
    for r in rows:
        assert r["a_id"] < r["b_id"]
        assert r["jaccard"] >= 0.5
        assert r["jaccard"] == r["shared"] / r["union_sz"]


def test_ppjoin_dedup_first_identical_on_duplicate_heavy_corpus(spark):
    """r15: the grouped rewrite (collapse exact-duplicate token sets,
    join representatives, expand) must be row-identical to the default
    path — exercised on a corpus with clone groups (the regime the
    heavy probe measured the naive verify growing ~M² on), including
    permuted-word clones (same token SET, different text — the set
    fingerprint must group them) and below-width docs (dropped by both
    paths)."""
    from healthcare_aws_data_engineering_spark.operators.ppjoin import (
        prefix_jaccard_join,
    )

    base = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "pack my box with five dozen liquor jugs right now"),
        (3, "the quick brown fox jumps over the lazy cat tonight"),
        (4, "sphinx of black quartz judge my vow said the king"),
        (5, "a b"),  # below shingle width: dropped by both paths
    ]
    clones = [
        (did + 100 * k, text)
        for did, text in base
        if did != 5
        for k in range(1, 4)
    ]
    docs = spark.createDataFrame(
        base + clones, "doc_id long, text string"
    )
    key = lambda rows: sorted(
        (r["a_id"], r["b_id"], r["shared"], r["union_sz"], r["jaccard"])
        for r in rows
    )
    got = key(prefix_jaccard_join(docs, dedup_first=True).collect())
    want = key(prefix_jaccard_join(docs).collect())
    assert got == want
    # clone groups make intra-group 1.0 pairs and cross-group expansion
    # both non-trivial
    assert any(j == 1.0 for *_, j in got)
    assert any(j < 1.0 for *_, j in got)


def test_source_terms_lift_semantics(spark):
    from healthcare_aws_data_engineering_spark.plans.corpus_queries import (
        ST_TOP_K,
        q_source_terms,
    )

    rows = q_source_terms(spark, SF_DIR).collect()
    assert rows
    by_source = {}
    for r in rows:
        assert 1 <= r["rank"] <= ST_TOP_K
        assert r["lift"] > 0
        by_source.setdefault(r["source"], []).append(r)
    for rs in by_source.values():
        rs.sort(key=lambda r: r["rank"])
        lifts = [r["lift"] for r in rs]
        assert lifts == sorted(lifts, reverse=True)
    # python twin for one source's top term
    docs = load_table(spark, SF_DIR, "documents").select("source", "text").collect()
    from collections import Counter

    tf_s, tf_g = {}, Counter()
    for d in docs:
        for w in d["text"].split(" "):
            tf_s.setdefault(d["source"], Counter())[w] += 1
            tf_g[w] += 1
    src = rows[0]["source"]
    ns = sum(tf_s[src].values())
    ng = sum(tf_g.values())
    best = max(
        tf_s[src].items(),
        key=lambda kv: ((kv[1] * ng) / (ns * tf_g[kv[0]]), ),
    )
    expected_lift = (best[1] * ng) / (ns * tf_g[best[0]])
    top = next(r for r in rows if r["source"] == src and r["rank"] == 1)
    assert top["lift"] == expected_lift


def test_importance_sample_replays_md5_coin(spark):
    rows = q_importance_sample(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        h = hashlib.md5(f"imp#{r['doc_id']}".encode()).hexdigest()
        bucket = int(h[:8], 16) % IMP_GRID
        assert bucket == r["bucket"]
        weight = r["n_chars"] / (r["n_chars"] + IMP_HALF_CHARS)
        assert bucket < weight * IMP_GRID
    # longer docs keep with higher probability: the kept set's mean
    # length should exceed the corpus mean
    docs = load_table(spark, SF_DIR, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    kept_mean = sum(r["n_chars"] for r in rows) / len(rows)
    assert kept_mean > corpus_mean * 0.9


def test_late_suppliers_python_twin(spark):
    """Q21 semantics verified by a third, row-at-a-time implementation
    (independent of both the windowed Spark plan and the correlated
    EXISTS oracle): per finished order, collect supplier and late-
    supplier sets in plain Python; a supplier waits on an order iff it
    is late, another supplier exists, and no OTHER supplier is late."""
    from healthcare_aws_data_engineering_spark.plans.warehouse_queries import (
        LS_LATE_DAYS,
        q_late_suppliers,
    )
    import datetime

    orders = {
        r.o_orderkey: r.o_orderdate
        for r in load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .collect()
    }
    per_order: dict[int, dict[str, set]] = {}
    for r in load_table(spark, SF_DIR, "lineitem").collect():
        od = orders.get(r.l_orderkey)
        if od is None:
            continue
        slot = per_order.setdefault(r.l_orderkey, {"all": set(), "late": set()})
        slot["all"].add(r.l_suppkey)
        if r.l_shipdate > od + datetime.timedelta(days=LS_LATE_DAYS):
            slot["late"].add(r.l_suppkey)
    numwait: dict[int, int] = {}
    for slot in per_order.values():
        if len(slot["late"]) == 1 and len(slot["all"]) >= 2:
            (s,) = slot["late"]
            numwait[s] = numwait.get(s, 0) + 1
    got = {r.s_suppkey: r.numwait for r in q_late_suppliers(spark, SF_DIR).collect()}
    assert got == numwait
    assert got, "fixture produced no waiting suppliers"


def test_small_qty_revenue_python_twin(spark):
    """Q17 semantics from first principles: per part of the filtered
    class, plain-Python mean quantity; sum prices of lines strictly
    under 20% of it, divide by 7. Tolerance covers the engine's exact-
    decimal summation vs Python float accumulation."""
    from healthcare_aws_data_engineering_spark.plans.warehouse_queries import (
        SQR_BRAND,
        SQR_TYPE,
        q_small_qty_revenue,
    )

    keys = {
        r.p_partkey
        for r in load_table(spark, SF_DIR, "part")
        .filter((F.col("p_brand") == SQR_BRAND) & (F.col("p_type") == SQR_TYPE))
        .collect()
    }
    by_part: dict[int, list] = {}
    for r in load_table(spark, SF_DIR, "lineitem").collect():
        if r.l_partkey in keys:
            by_part.setdefault(r.l_partkey, []).append(r)
    total = 0.0
    kept = 0
    for rows in by_part.values():
        avg = sum(x.l_quantity for x in rows) / len(rows)
        for x in rows:
            if x.l_quantity < 0.2 * avg:
                total += x.l_extendedprice
                kept += 1
    got = q_small_qty_revenue(spark, SF_DIR).collect()[0].avg_yearly
    if kept == 0:
        assert got is None
    else:
        assert abs(got - total / 7.0) < 1e-6 * max(1.0, abs(got))


def test_top_supplier_python_twin(spark):
    """Q15 semantics from first principles: quarterly revenue per
    supplier in plain Python; every supplier within float tolerance of
    the max must be exactly the engine's result set."""
    from healthcare_aws_data_engineering_spark.plans.warehouse_queries import (
        TS_END,
        TS_START,
        q_top_supplier,
    )
    import datetime

    t0 = datetime.datetime.fromisoformat(TS_START)
    t1 = datetime.datetime.fromisoformat(TS_END)
    rev: dict[int, float] = {}
    for r in load_table(spark, SF_DIR, "lineitem").collect():
        if t0 <= r.l_shipdate < t1:
            rev[r.l_suppkey] = rev.get(r.l_suppkey, 0.0) + r.l_extendedprice * (
                1 - r.l_discount
            )
    mx = max(rev.values())
    want = {k for k, v in rev.items() if abs(v - mx) < 1e-6}
    got = q_top_supplier(spark, SF_DIR).collect()
    assert {r.s_suppkey for r in got} == want
    for r in got:
        assert abs(r.total_revenue - mx) < 1e-6
