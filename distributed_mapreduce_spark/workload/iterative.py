"""Iterative fixed-point graph algorithms — damped PageRank power
iteration to a convergence readout.

Reference parity note: the reference runs iterative algorithms by
re-submitting maple/juice commands to the fileserver
(`file_server/fileserver.py`, per MP4-RUN-Command.txt); each Spark
iteration here is one join + aggregate
over the edge list — the same Pregel superstep, with
`localCheckpoint()` truncating lineage per round (without it the plan
nests every iteration; cf. connected components and the k-means Lloyd
loop in `clustering.py`).

All arithmetic is integer (micro-unit masses, floor division) so the
iteration is bit-exact across engines — float PageRank is
summation-order-dependent and cannot be oracle-checked exactly. The
DuckDB oracle is the same recurrence unrolled into one CTE per
iteration.

Scale notes (100 TB):
- The adjacency list is hash-partitioned on the source node and
  persisted once; every iteration reuses that partitioning for the
  mass join (no re-shuffle of the big side), then shuffles only the
  (dst, share) contributions into the per-node aggregate — the
  standard Pregel/GraphX message-passing plan.
- Per-iteration state is one (node, mass) row per node — orders of
  magnitude smaller than the edge list; `localCheckpoint` keeps the
  plan O(1) in iteration count.
- The convergence readout (L1 delta between successive mass vectors)
  is a one-row aggregate per iteration, unioned lazily — no driver
  collect in the query path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_mapreduce_spark.workload.registry import query, table

#: Initial mass per node, in micro-units.
PR_M0 = 1_000_000

#: Damping 0.85 as an exact integer ratio; teleport floor = (1-d)*M0.
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100
PR_BASE = PR_M0 * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN

#: Fixed power-iteration count (bounded loop; the readout shows the
#: contraction so a caller can pick its own stopping rule).
PR_ITERS = 4

_ADJ_SQL = """
    edges0 AS (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ), adj AS (
      SELECT s * 2 AS u, p * 2 + 1 AS v FROM edges0
      UNION ALL
      SELECT p * 2 + 1 AS u, s * 2 AS v FROM edges0
    ), deg AS (
      SELECT u, count(*) AS d FROM adj GROUP BY u
    )
"""


def _pagerank_oracle(iters: int) -> str:
    ctes = [_ADJ_SQL, f", m0 AS (SELECT u, CAST({PR_M0} AS BIGINT) AS m FROM deg)"]
    for k in range(1, iters + 1):
        ctes.append(
            f""", m{k} AS (
              SELECT a.v AS u,
                     CAST({PR_BASE} + ({PR_DAMP_NUM} * sum(m{k - 1}.m // deg.d))
                          // {PR_DAMP_DEN} AS BIGINT) AS m
              FROM adj a
              JOIN m{k - 1} ON a.u = m{k - 1}.u
              JOIN deg ON a.u = deg.u
              GROUP BY a.v
            ), d{k} AS (
              SELECT CAST({k} AS INTEGER) AS iter,
                     CAST(count(*) AS BIGINT) AS n_nodes,
                     CAST(sum(n.m) AS BIGINT) AS total_mass,
                     CAST(sum(abs(n.m - p.m)) AS BIGINT) AS l1_delta
              FROM m{k} n JOIN m{k - 1} p ON n.u = p.u
            )"""
        )
    union = "\nUNION ALL\n".join(f"SELECT * FROM d{k}" for k in range(1, iters + 1))
    return "WITH " + "".join(ctes) + "\n" + union


def _bipartite_adj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier↔part bipartite adjacency shared by every iterative
    query in this module (`_ADJ_SQL`'s Spark twin — one definition so
    the node-id encoding can never diverge between PageRank and PPR):
    distinct lineitem edges, supplier node 2s / part node 2p+1, both
    directions, hash-partitioned on the source node and persisted so
    every iteration reuses the partitioning."""
    li = table(spark, sf_dir, "lineitem")
    e0 = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    return (
        e0.select((F.col("s") * 2).alias("u"), (F.col("p") * 2 + 1).alias("v"))
        .unionAll(e0.select((F.col("p") * 2 + 1).alias("u"), (F.col("s") * 2).alias("v")))
        .repartition(spark.sparkContext.defaultParallelism, "u")
        .persist()
    )


@query("pagerank_converge", oracle=_pagerank_oracle(PR_ITERS))
def q_pagerank_converge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped integer PageRank on the supplier↔part bipartite graph
    (distinct lineitem edges, both directions; supplier node id 2s,
    part node id 2p+1), run for {PR_ITERS} power iterations. Returns
    one row per iteration: node count, total mass, and the L1 delta
    vs the previous mass vector — the convergence readout (deltas
    contract by roughly the damping factor per round).

    mass'(v) = BASE + (85 · Σ_{u→v} mass(u) DIV deg(u)) DIV 100 —
    all integer floor arithmetic, matching the unrolled-CTE oracle
    bit-for-bit."""
    adj = _bipartite_adj(spark, sf_dir)
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    mass = deg.select("u", F.lit(PR_M0).cast("long").alias("m")).localCheckpoint()

    readouts: list[DataFrame] = []
    for k in range(1, PR_ITERS + 1):
        contrib = (
            adj.join(mass, "u")
            .join(deg, "u")
            .select("v", F.expr("m DIV d").cast("long").alias("share"))
        )
        mass_next = (
            contrib.groupBy("v")
            .agg(F.sum("share").alias("insum"))
            .select(
                F.col("v").alias("u"),
                (
                    F.lit(PR_BASE)
                    + F.expr(f"({PR_DAMP_NUM} * insum) DIV {PR_DAMP_DEN}")
                ).cast("long").alias("m"),
            )
            .localCheckpoint()
        )
        prev = mass.withColumnRenamed("m", "pm")
        readouts.append(
            mass_next.join(prev, "u").agg(
                F.lit(k).cast("int").alias("iter"),
                F.count(F.lit(1)).cast("long").alias("n_nodes"),
                F.sum("m").cast("long").alias("total_mass"),
                F.sum(F.abs(F.col("m") - F.col("pm"))).cast("long").alias("l1_delta"),
            )
        )
        mass = mass_next

    out = readouts[0]
    for r in readouts[1:]:
        out = out.unionAll(r)
    return out


#: Personalized PageRank: restart mass concentrates on one seed node
#: (supplier 1 → bipartite node id 2); µµ-unit masses give the integer
#: floor divisions three rounds of headroom.
PPR_SEED_NODE = 2
PPR_M0 = 1_000_000_000_000
PPR_RESTART = PPR_M0 * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
PPR_ROUNDS = 3
PPR_TOP_K = 20


def _ppr_oracle(rounds: int) -> str:
    ctes = [
        _ADJ_SQL,
        f""", m0 AS (
          SELECT CAST({PPR_SEED_NODE} AS BIGINT) AS u,
                 CAST({PPR_M0} AS BIGINT) AS m
        )""",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f""", m{k} AS (
              SELECT u, CAST(sum(m) AS BIGINT) AS m FROM (
                SELECT a.v AS u,
                       CAST(({PR_DAMP_NUM} * sum(m{k - 1}.m // deg.d))
                            // {PR_DAMP_DEN} AS BIGINT) AS m
                FROM adj a
                JOIN m{k - 1} ON a.u = m{k - 1}.u
                JOIN deg ON a.u = deg.u
                GROUP BY a.v
                UNION ALL
                SELECT CAST({PPR_SEED_NODE} AS BIGINT),
                       CAST({PPR_RESTART} AS BIGINT)
              ) GROUP BY u
            )"""
        )
    return (
        "WITH "
        + "".join(ctes)
        + f"""
        SELECT u, m FROM m{rounds}
        ORDER BY m DESC, u LIMIT {PPR_TOP_K}"""
    )


@query("graph_ppr_seed", oracle=_ppr_oracle(PPR_ROUNDS))
def q_graph_ppr_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from a single seed (supplier 1) on the
    supplier↔part bipartite graph, {PPR_ROUNDS} power rounds of
    m'(v) = (85 · Σ_{{u→v}} m(u) DIV deg(u)) DIV 100, with the
    15% restart mass re-injected at the SEED each round instead of
    spread uniformly — the seed-relative relevance score used for
    crawl frontier prioritization and "quality flows from trusted
    seeds" corpus curation (the TrustRank shape). Output: the
    top-{PPR_TOP_K} nodes by final mass.

    Plan: mass lives ONLY on reached nodes — round k touches the
    k-hop ball of the seed, not the whole graph (the frontier-sparse
    property that makes seed-PPR cheap at 100 TB); adjacency is
    hash-partitioned once and reused every round; per-round state is
    `localCheckpoint`ed. Integer µµ-unit masses, floor divisions in a
    fixed order — bit-exact vs the unrolled-CTE oracle. Final top-k is
    TakeOrdered (per-partition heads + driver merge), not a global
    sort."""
    adj = _bipartite_adj(spark, sf_dir)
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    spark_seed = spark.range(1).select(
        F.lit(PPR_SEED_NODE).cast("long").alias("u"),
        F.lit(PPR_M0).cast("long").alias("m"),
    )
    mass = spark_seed.localCheckpoint()
    restart = spark.range(1).select(
        F.lit(PPR_SEED_NODE).cast("long").alias("u"),
        F.lit(PPR_RESTART).cast("long").alias("m"),
    )
    for _ in range(PPR_ROUNDS):
        spread = (
            adj.join(mass, "u")
            .join(deg, "u")
            .select("v", F.expr("m DIV d").cast("long").alias("share"))
            .groupBy("v")
            .agg(F.sum("share").alias("insum"))
            .select(
                F.col("v").alias("u"),
                F.expr(f"({PR_DAMP_NUM} * insum) DIV {PR_DAMP_DEN}")
                .cast("long")
                .alias("m"),
            )
        )
        mass = (
            spread.unionAll(restart)
            .groupBy("u")
            .agg(F.sum("m").cast("long").alias("m"))
            .localCheckpoint()
        )
    return mass.orderBy(F.desc("m"), "u").limit(PPR_TOP_K)
