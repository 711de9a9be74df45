"""Physical-plan inspection for the core operator pipelines.

Prints `.explain("formatted")` for representative plans and checks the
scale-critical properties directly from the plan text:

- column pruning reaches the parquet scan (ReadSchema lists only used cols)
- predicate pushdown reaches the scan (PushedFilters non-empty where a
  filter exists)
- the sketch-build plan has NO Exchange before the mapInPandas partials
  (raw rows never shuffle; only sketch blobs do)
- probe-side plans stay in WholeStageCodegen up to the single Arrow eval

Usage: PYTHONPATH=/root/repo python tools/explain_plans.py [sf_dir]
"""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def check(name: str, plan: str, want: list, forbid: list) -> bool:
    ok = True
    for w in want:
        if w not in plan:
            print(f"  MISSING: {w!r}")
            ok = False
    for fb in forbid:
        if fb in plan:
            print(f"  FORBIDDEN PRESENT: {fb!r}")
            ok = False
    print(f"{'PASS' if ok else 'FAIL'}  {name}")
    return ok


def main():
    from pyspark.sql import SparkSession, functions as F
    from sparksketch.agg import (BloomSpec, HLLSpec, build_partials,
                                 build_partials_multi, with_might_contain)
    from sparksketch.shape import Shape

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    ok = True

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")

    # 1. partial build: projection-only scan, no shuffle before mapInPandas
    p1 = plan_of(build_partials(orders, BloomSpec(Shape.from_np(1000, 1e-6)),
                                ["o_custkey"]))
    print(p1)
    ok &= check("bloom build partials: pruned scan, zero shuffle", p1,
                want=["MapInPandas", "ReadSchema: struct<o_custkey:bigint>"],
                forbid=["Exchange"])

    # 2. filtered build: predicate pushed to the scan
    p2 = plan_of(build_partials(
        orders.filter(F.col("o_orderstatus") == "F"),
        HLLSpec(p=12), ["o_custkey"]))
    print(p2)
    ok &= check("filtered build: pushdown + 2-col scan", p2,
                want=["PushedFilters: [IsNotNull(o_orderstatus), "
                      "EqualTo(o_orderstatus,F)]"],
                forbid=["Exchange"])

    # 3. membership semi-join: map-side filter, no shuffle, ONE UDF eval
    # (keeping the probe column after the filter would make Catalyst
    # evaluate the pandas UDF twice — filter+drop collapses it to one)
    blob = __import__("sparksketch.agg", fromlist=["tree_aggregate"]) \
        .tree_aggregate(build_partials(
            orders, BloomSpec(Shape.from_np(100_000, 1e-6)), ["o_custkey"]))
    semi = (with_might_contain(customer.select("c_custkey"), blob,
                               ["c_custkey"], "_mc")
            .filter(F.col("_mc")).drop("_mc"))
    p3 = plan_of(semi)
    print(p3)
    ok &= check("bloom semi-join: map-side, no shuffle, codegen filter", p3,
                want=["ArrowEvalPython", "* Filter",
                      "ReadSchema: struct<c_custkey:bigint>"],
                forbid=["Exchange"])
    # one eval NODE = header line + its detail section
    assert p3.count("ArrowEvalPython") == 2, "probe UDF must evaluate once"
    print("PASS  bloom semi-join evaluates the probe UDF exactly once")

    # 4. multi-sketch single pass: ONE scan feeds all sketches
    p4 = plan_of(build_partials_multi(orders, {
        "h": (HLLSpec(p=12), ["o_custkey"]),
        "b": (BloomSpec(Shape.from_np(1000, 1e-6)), ["o_custkey", "o_orderstatus"]),
    }))
    print(p4)
    ok &= check("multi-sketch: one scan, one Arrow crossing", p4,
                want=["MapInPandas"], forbid=["Exchange", "Union"])
    # one scan NODE = one "(n) Scan parquet" detail header
    assert p4.count(") Scan parquet") == 1, "multi-sketch must scan ONCE"
    print("PASS  multi-sketch scans parquet exactly once")

    # 5. segmented grouped build (high-cardinality groups): raw rows never
    # shuffle — the ONLY Exchange in the plan is AFTER the mapInPandas
    # partial build, i.e. it moves KB-scale sketch rows, not data rows
    from sparksketch.agg import BottomKSpec, grouped_sketch_segmented
    p5 = plan_of(grouped_sketch_segmented(
        orders, ["o_custkey"], BottomKSpec(k=64), ["o_orderkey"]))
    print(p5)
    ok &= check("segmented grouped build: single sketch-row exchange", p5,
                want=["MapInPandas"], forbid=["FlatMapGroupsInPandas"])
    # the tree prints top-down, so compare plan NODE NUMBERS (dataflow
    # order: (1) scan ... (n) sink): both stages are MapInPandas and the
    # single Exchange sits BETWEEN them — it moves sketch rows only
    import re
    ex_ids = [int(m) for m in re.findall(r"\bExchange \((\d+)\)", p5)]
    map_ids = sorted(int(m) for m in
                     re.findall(r"\bMapInPandas \((\d+)\)", p5))
    assert len(ex_ids) == 1, f"expected exactly one Exchange, got {ex_ids}"
    assert len(map_ids) == 2 and map_ids[0] < ex_ids[0] < map_ids[1], \
        "raw rows must not shuffle before the segmented partial build"
    print("PASS  segmented grouped build shuffles only sketch rows")

    # 6. layered `find` probe: the probe UDF runs map-side over the
    # broadcast blob — the only Exchanges in the plan are the inherent
    # ones (distinct build of the probe set, final tiny groupBy of
    # (layer, count) rows), never a shuffle of probe rows to reach the
    # sketch
    from sparksketch.agg import (LayeredBloomSpec, tree_aggregate,
                                 with_layer_find)
    ev = orders.withColumn("day", (F.col("o_orderkey") % 7).cast("long"))
    lblob = tree_aggregate(build_partials(
        ev, LayeredBloomSpec(Shape.from_np(10_000, 1e-9), layer_col="day"),
        ["o_custkey"]))
    probe_plan = plan_of(
        with_layer_find(orders.select("o_custkey").distinct(), lblob,
                        ["o_custkey"], out_col="days")
        .select(F.explode("days").alias("day"))
        .groupBy("day").agg(F.count("*").alias("c")))
    print(probe_plan)
    ok &= check("layered find probe: map-side eval, inherent shuffles only",
                probe_plan, want=["ArrowEvalPython"], forbid=[])
    n_probe_ex = len(re.findall(r"\bExchange \((\d+)\)", probe_plan))
    assert n_probe_ex <= 2, \
        f"probe plan must only shuffle for distinct + final agg, got {n_probe_ex}"
    print("PASS  layered find probe adds no probe-side shuffle")

    # 7. grouped fixed-k KLL (per-conv latency p95, the billions-of-groups
    # plan): raw rows shuffle exactly ONCE, for the inherent lag-window
    # (delta computation) — between the two segmented mapInPandas stages
    # only KB-scale sketch rows cross an Exchange; anything after stage 2
    # moves (conv_id, p95) result rows
    import __spark_entry__ as se
    p7 = plan_of(se.q_kll_grouped_fixedk_latency(spark, SF))
    print(p7)
    ex7 = sorted(int(m) for m in re.findall(r"\bExchange \((\d+)\)", p7))
    map7 = sorted(int(m) for m in re.findall(r"\bMapInPandas \((\d+)\)", p7))
    win7 = sorted(int(m) for m in re.findall(r"\bWindow \((\d+)\)", p7))
    assert len(map7) == 2, f"expected 2 segmented stages, got {map7}"
    # every pre-build Exchange must feed a Window (the transcript
    # turn-ordering + lag derivation); the build itself adds NO raw-row
    # shuffle: nothing between the last Window and stage 1
    assert win7 and not [e for e in ex7 if win7[-1] < e < map7[0]], \
        "the partial build must not shuffle raw rows beyond the windows"
    assert len([e for e in ex7 if map7[0] < e < map7[1]]) == 1, \
        "exactly one sketch-row Exchange between segmented stages"
    print("PASS  grouped fixed-k KLL shuffles raw rows only for the "
          "lag window; sketch rows otherwise")

    # 8. one-scan CUBE: every coarser grouping set derives by MERGING the
    # persisted finest sketch rows — the 2^d grouping sets cost ONE
    # parquet scan, not 2^d (grouped_sketch_cube's core claim)
    from sparksketch.agg import grouped_sketch_cube
    p8 = plan_of(grouped_sketch_cube(
        orders, ["o_orderstatus", "o_orderpriority"], BottomKSpec(k=64),
        ["o_custkey"]))
    n_scans = p8.count(") Scan parquet")
    assert n_scans == 1, f"CUBE must scan parquet once, saw {n_scans}"
    print("PASS  one-scan CUBE: 2^d grouping sets from a single scan")

    # 9. materialized IVF index: probing n_probe cells is storage-level
    # PARTITION PRUNING (the scan's PartitionFilters carry the cell IN
    # predicate), not a post-scan filter — at 100 TB the other cells'
    # files are never opened
    import shutil
    import tempfile
    import numpy as np
    from sparksketch.similarity import ivf_query_index, ivf_write_index
    emb = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .select("vec_id", "embedding")
    qv = np.array(emb.first()["embedding"], dtype=np.float64)
    idx_dir = tempfile.mkdtemp(prefix="ivf_plan_")
    try:
        ivf_write_index(emb, idx_dir, n_centroids=8)
        p9 = plan_of(ivf_query_index(spark, idx_dir, qv, k=5, n_probe=2))
        print(p9)
        pf = [ln for ln in p9.splitlines() if "PartitionFilters" in ln]
        assert pf and "cell" in pf[0] and "IN" in pf[0], \
            f"cell probe must reach PartitionFilters, got {pf}"
        print("PASS  IVF index probe prunes cell partitions at the scan")
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    # 10. hash-threshold / mixture sampling: pure map-side — zero
    # Exchange, zero Python eval; the md5-threshold compare runs inside
    # WholeStageCodegen directly above the pruned scan
    from sparksketch.sampling import weighted_mixture_sample
    p10 = plan_of(weighted_mixture_sample(
        orders.select("o_orderkey", "o_orderstatus"), "o_orderstatus",
        {"F": 0.25, "O": 0.5}, ["o_orderkey"], salt="s"))
    print(p10)
    ok &= check("mixture sample: map-side only, codegen filter", p10,
                want=["* Filter"],
                forbid=["Exchange", "ArrowEvalPython", "MapInPandas",
                        "BatchEvalPython"])

    # 11. per-group reservoir: exactly ONE raw-row Exchange (the group
    # window), no Python eval, and Spark's WindowGroupLimit kicks in —
    # the rank<=k filter becomes a map-side partial top-k BEFORE the
    # shuffle, so shuffle volume is O(k per group per partition), not
    # the full table
    from sparksketch.sampling import per_group_sample
    p11 = plan_of(per_group_sample(
        orders.select("o_custkey", "o_orderkey"), ["o_custkey"],
        ["o_orderkey"], k=2, salt="s"))
    print(p11)
    ok &= check("per-group reservoir: one shuffle, WindowGroupLimit", p11,
                want=["WindowGroupLimit"],
                forbid=["ArrowEvalPython", "MapInPandas"])
    ex11 = re.findall(r"\bExchange \((\d+)\)", p11)
    assert len(ex11) == 1, f"reservoir must shuffle exactly once, got {ex11}"
    limits11 = re.findall(r"WindowGroupLimit \((\d+)\)",  p11)
    assert len(limits11) == 2, \
        "expected Partial+Final WindowGroupLimit pair (map-side top-k)"
    print("PASS  per-group reservoir does map-side partial top-k")

    # 12. bloom anti-join: the certain-'no' branch is a map-side codegen
    # filter over ONE Arrow eval; the residual exact cleanup is a
    # left_anti join of only the 'maybe' rows
    from sparksketch.agg import bloom_anti_join
    p12 = plan_of(bloom_anti_join(
        customer.select("c_custkey"), ["c_custkey"],
        orders.filter(F.col("o_orderstatus") == "F").select("o_custkey"),
        ["o_custkey"], expected_n=10_000))
    print(p12)
    ok &= check("bloom anti-join: map-side reduction + exact cleanup", p12,
                want=["LeftAnti", "ArrowEvalPython"], forbid=[])
    # the probe UDF evaluates once per branch (definite-out + maybe) over
    # the probe table — two scans that shuffle only the 'maybe' rows beats
    # one scan that shuffles everything.  Catalyst's constraint propagation
    # additionally infers the probe predicate onto the small build side
    # (harmless: every build key passes its own filter), so the plan holds
    # at most 3 eval nodes x (header + detail) = 6 mentions.
    assert p12.count("ArrowEvalPython") <= 6, \
        "anti-join must not re-evaluate the probe UDF per downstream use"
    print("PASS  bloom anti-join keeps one probe eval per branch")

    # -- materialized sketch view: segment restriction is PARTITION
    # pruning in the scan (round 5) -------------------------------------
    import tempfile
    import shutil
    from sparksketch.agg import BottomKSpec
    from sparksketch.view import view_append, view_materialize, view_rows
    events = spark.read.parquet(f"{SF}/events.parquet")
    vdir = tempfile.mkdtemp(prefix="sparksketch_planview_")
    try:
        half = F.xxhash64(F.col("event_id").cast("string")) % 2 == 0
        spec = BottomKSpec(k=4096)
        view_materialize(events.filter(half), ["event_type"], spec,
                         ["user_id"], vdir)
        view_append(events.filter(~half), spec, ["user_id"], vdir)
        vplan = plan_of(view_rows(spark, vdir, group_cols=[],
                                  segments=[0]))
        ok &= check("sketch view: segment restriction is partition "
                    "pruning", vplan, ["PartitionFilters", "seg"], [])
    finally:
        shutil.rmtree(vdir, ignore_errors=True)

    # -- range_bucket stays inside whole-stage codegen (no Python eval
    # in the bucket-assignment hot path; round 5) ------------------------
    from sparksketch.partitioning import range_bucket
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    bplan = plan_of(li.select(
        range_bucket("l_extendedprice", [901.0, 2201.5, 4401.25])
        .alias("b")))
    ok &= check("range_bucket: JVM-only bucket assignment, pruned scan",
                bplan,
                ["size(filter(", "ReadSchema: struct<l_extendedprice"],
                ["BatchEvalPython", "ArrowEvalPython", "mapInPandas"])

    spark.stop()
    print("\nALL PLAN CHECKS PASSED" if ok else "\nPLAN CHECKS FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
