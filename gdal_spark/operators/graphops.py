"""Web link-graph operators: PageRank power iteration over the document
hyperlink graph.

The webtext side of this engine treats the corpus as a crawled web graph
(the same shape PageRank was defined on — Page et al. 1999, "The PageRank
citation ranking"). GDAL has no graph surface; this module is part of the
training-data-pipeline extension set, like operators/textops.py.

Scale design: each power iteration is one shuffle join of the rank vector
against the edge list on src (the same key the out-degree table aggregated
on) followed by a map-side-combined groupBy(dst) sum — the canonical
PageRank-on-a-cluster plan. The dangling-node mass is a single scalar
aggregate broadcast back into the update, never a row-wise blowup. At
10^12 edges the rank vector must be checkpointed every round anyway — it
feeds two consumers per iteration (dangling mass + contributions), so an
unbounded lazy chain doubles the plan each round. pagerank() therefore
localCheckpoints the vector once per iteration, and the oracle replays
the unrolled iterations CTE-for-CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# deterministic synthetic hyperlink topology over contiguous doc_ids
# (TESTDATA.md documents table): every 17th page is a sink (no outlinks,
# exercising the dangling-mass redistribution); every other page links to
# three targets via a fixed affine map, self-loops dropped.
LINK_FANOUT = (1, 2, 3)
LINK_MULT = 31
LINK_STEP = 97
SINK_MOD = 17


def link_edges(docs: DataFrame, n_docs: int) -> DataFrame:
    """(src, dst) hyperlink edges derived deterministically from doc_id."""
    d = docs.select(F.col("doc_id").alias("src")) \
        .where(F.col("src") % SINK_MOD != 0)
    e = d.select(
        "src",
        F.explode(F.array(*[F.lit(j) for j in LINK_FANOUT])).alias("j"))
    e = e.select(
        "src",
        ((F.col("src") * LINK_MULT + F.col("j") * LINK_STEP) % n_docs)
        .alias("dst"))
    return e.where(F.col("dst") != F.col("src"))


def pagerank(docs: DataFrame, iters: int = 8,
             alpha: float = 0.85) -> DataFrame:
    """-> (doc_id, rank_r): damped PageRank after ``iters`` synchronous
    power iterations from the uniform vector, with dangling mass
    redistributed uniformly each round:

        r'(v) = (1-alpha)/n + alpha * (sum_{u->v} r(u)/deg(u) + D/n)

    where D is the total rank held by pages with no outlinks. Every
    iteration is (rank join edges on src) -> groupBy(dst) partial-agg
    sum, plus one scalar dangling aggregate broadcast into the update;
    ranks are rounded to 8 decimals at the end only.
    """
    n = docs.count()
    edges = link_edges(docs, n)
    outdeg = edges.groupBy("src").agg(F.count("*").cast("long")
                                      .alias("deg"))
    # the edge list, degree table and node set are loop-invariant: pin
    # them once instead of re-deriving from the source scan every round
    outdeg = outdeg.localCheckpoint(eager=True)
    linked = edges.join(outdeg, "src").localCheckpoint(eager=True)
    nodes = docs.select(F.col("doc_id").alias("v")) \
        .localCheckpoint(eager=True)
    ranks = nodes.select("v", F.lit(1.0 / n).alias("r"))
    tele = (1.0 - alpha) / n
    for it in range(iters):
        # the rank vector feeds BOTH the dangling aggregate and the
        # contribution join; without truncation the lazy plan doubles
        # every iteration (2^iters analysis blowup). localCheckpoint
        # every second round bounds the plan at 4x while halving the
        # materialization actions — the same lineage-truncation cadence
        # a 10^12-edge run needs.
        ranks = ranks.localCheckpoint(eager=True)
        dm = (ranks.join(outdeg.select(F.col("src").alias("v")),
                         "v", "left_anti")
              .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm")))
        contrib = (linked.join(ranks, linked["src"] == ranks["v"])
                   .select(F.col("dst").alias("v"),
                           (F.col("r") / F.col("deg")).alias("c"))
                   .groupBy("v").agg(F.sum("c").alias("c")))
        ranks = (nodes.join(contrib, "v", "left")
                 .crossJoin(F.broadcast(dm))
                 .select("v",
                         (F.lit(tele)
                          + F.lit(alpha)
                          * (F.coalesce(F.col("c"), F.lit(0.0))
                             + F.col("dm") / n)).alias("r")))
    return ranks.select(F.col("v").alias("doc_id"),
                        F.round("r", 8).alias("rank_r"))


def hits(docs: DataFrame, iters: int = 8) -> DataFrame:
    """-> (doc_id, auth_r, hub_r): Kleinberg's HITS (1999, "Authoritative
    sources in a hyperlinked environment") after ``iters`` rounds of the
    classic mutual update from the all-ones hub vector:

        a' = normalize2(E^T h)        h' = normalize2(E a')

    (authorities first from the old hubs, hubs from the NEW authorities).
    Each half-step is one shuffle join of a score vector against the edge
    list plus a scalar L2-norm aggregate broadcast into the division;
    vectors are localCheckpoint-ed per half-step for the same
    two-consumers lineage reason as pagerank()."""
    n = docs.count()
    edges = link_edges(docs, n).localCheckpoint(eager=True)
    nodes = docs.select(F.col("doc_id").alias("v")) \
        .localCheckpoint(eager=True)

    def _half(vec: DataFrame, col: str, join_on: str, group_to: str,
              out: str) -> DataFrame:
        raw = (edges.join(vec, edges[join_on] == vec["v"])
               .groupBy(group_to).agg(F.sum(col).alias("s")))
        full = (nodes.join(raw, nodes["v"] == raw[group_to], "left")
                .select(nodes["v"],
                        F.coalesce(F.col("s"), F.lit(0.0)).alias("s")))
        nz = full.agg(F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("nz"))
        return (full.crossJoin(F.broadcast(nz))
                .select("v", (F.col("s") / F.col("nz")).alias(out))
                .localCheckpoint(eager=True))

    hub = nodes.select("v", F.lit(1.0).alias("h")) \
        .localCheckpoint(eager=True)
    auth = None
    for _ in range(iters):
        auth = _half(hub, "h", "src", "dst", "a")
        hub = _half(auth, "a", "dst", "src", "h")
    return (auth.join(hub, "v")
            .select(F.col("v").alias("doc_id"),
                    F.round("a", 8).alias("auth_r"),
                    F.round("h", 8).alias("hub_r")))


def degree_stats(docs: DataFrame) -> DataFrame:
    """-> (doc_id, out_deg, in_deg, is_sink): per-page degree summary of
    the link graph — two map-side-combined groupBys joined back to the
    page table (no row-wise blowup beyond the edge explode)."""
    n = docs.count()
    edges = link_edges(docs, n)
    outd = edges.groupBy("src").agg(F.count("*").cast("long")
                                    .alias("out_deg"))
    ind = edges.groupBy("dst").agg(F.count("*").cast("long")
                                   .alias("in_deg"))
    return (docs.select(F.col("doc_id"))
            .join(outd, docs["doc_id"] == outd["src"], "left")
            .join(ind, docs["doc_id"] == ind["dst"], "left")
            .select("doc_id",
                    F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
                    F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
                    (F.col("doc_id") % SINK_MOD == 0).alias("is_sink")))


def triangle_stats(edges: DataFrame) -> DataFrame:
    """-> (n, deg, tri, lcc_r): per-node triangle count and local
    clustering coefficient of the UNDIRECTED simple graph underlying
    (src, dst) edges.

    Plan (the distributed node-iterator with total order — Suri &
    Vassilvitskii 2011 "Counting Triangles and the Curse of the Last
    Reducer", minus the degree-ordering optimization, which only
    matters under power-law skew): orient every edge low-id -> high-id
    and dedupe, then one self-equi-join on the middle vertex builds
    wedges a < b < c and one more equi-join against the edge set closes
    them. Each triangle materializes exactly once. Both joins are
    shuffle hash joins on a single key — no broadcast needed at any
    scale, and the wedge fan-out is bounded by the max ordered degree.
    lcc = 2*tri / (deg*(deg-1)), 0 where deg < 2, rounded to 8."""
    und = (edges.select(F.least("src", "dst").alias("u"),
                        F.greatest("src", "dst").alias("v"))
           .where(F.col("u") != F.col("v"))
           .distinct())
    deg = (und.select(F.col("u").alias("n"))
           .unionAll(und.select(F.col("v").alias("n")))
           .groupBy("n").agg(F.count("*").cast("long").alias("deg")))
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("b"), F.col("v").alias("c"))
    tri_abc = (e1.join(e2, "b")
               .join(und.select(F.col("u").alias("a"),
                                F.col("v").alias("c")), ["a", "c"]))
    tcnt = (tri_abc.select(F.col("a").alias("n"))
            .unionAll(tri_abc.select(F.col("b").alias("n")))
            .unionAll(tri_abc.select(F.col("c").alias("n")))
            .groupBy("n").agg(F.count("*").cast("long").alias("tri")))
    return (deg.join(tcnt, "n", "left")
            .select("n", "deg",
                    F.coalesce("tri", F.lit(0)).cast("long").alias("tri"),
                    F.round(F.when(F.col("deg") >= 2,
                                   2.0 * F.coalesce("tri", F.lit(0))
                                   / (F.col("deg")
                                      * (F.col("deg") - F.lit(1))))
                            .otherwise(0.0), 8).alias("lcc_r")))


def triangles(docs: DataFrame) -> DataFrame:
    """Per-page triangle count + local clustering coefficient over the
    deterministic document hyperlink graph."""
    n = docs.count()
    return (triangle_stats(link_edges(docs, n))
            .withColumnRenamed("n", "doc_id"))


def bfs_levels(docs: DataFrame, rounds: int = 6,
               seed_mod: int = 101) -> DataFrame:
    """-> (doc_id, hop): shortest link distance from the seed set
    (doc_id % seed_mod == 0) after ``rounds`` synchronous BFS rounds;
    pages not reached within ``rounds`` hops are absent (the crawl-depth
    question "what does a depth-k crawl from the seeds cover?").

    Plan: the frontier-join BFS — each round joins the CURRENT frontier
    (not the full visited set) against the edge list on src, anti-joins
    the visited set, and unions the new frontier in. At cluster scale
    both sides shuffle on one key; the visited set stays partitioned by
    doc_id across rounds so the anti-join co-locates. Rounds are
    synchronous barriers, exactly like the Pregel superstep model."""
    n = docs.count()
    edges = link_edges(docs, n).localCheckpoint(eager=True)
    visited = (docs.select("doc_id").where(F.col("doc_id") % seed_mod == 0)
               .select("doc_id", F.lit(0).alias("hop")))
    frontier = visited
    for k in range(1, rounds + 1):
        nxt = (frontier.join(edges, frontier["doc_id"] == edges["src"])
               .select(F.col("dst").alias("doc_id")).distinct()
               .join(visited.select("doc_id"), "doc_id", "left_anti")
               .select("doc_id", F.lit(k).alias("hop")))
        nxt = nxt.localCheckpoint(eager=True)   # cut the lineage per round
        visited = visited.unionAll(nxt)
        frontier = nxt
    return visited.select("doc_id", F.col("hop").cast("integer"))


def label_propagation(docs: DataFrame, rounds: int = 4) -> DataFrame:
    """-> (doc_id, label): synchronous label propagation communities
    (Raghavan, Albert & Kumara 2007) on the UNDIRECTED link graph after
    ``rounds`` supersteps. Deterministic variant: every node starts as
    its own label; each round a node adopts the most frequent label
    among its neighbors, ties broken by the SMALLEST label (the async
    random tie-break of the paper is not reproducible on a cluster —
    smallest-label is the standard deterministic choice); isolated
    nodes keep their own label.

    Plan per round: labels shuffle-join the symmetrized edge list on
    src (the same key every round — AQE keeps the exchange reused), a
    map-side-combined groupBy(dst, label) counts votes, and one bounded
    per-node window picks the argmax. The label vector localCheckpoints
    per round like pagerank (two consumers + unbounded lineage
    otherwise)."""
    from pyspark.sql import Window

    n = docs.count()
    e = link_edges(docs, n)
    edges = (e.unionAll(e.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst")))
             .distinct().localCheckpoint(eager=True))
    labels = docs.select("doc_id", F.col("doc_id").alias("label"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("votes").desc(), F.col("label").asc())
    for _ in range(rounds):
        votes = (labels.join(edges, labels["doc_id"] == edges["src"])
                 .groupBy(F.col("dst").alias("doc_id"), "label")
                 .agg(F.count("*").alias("votes")))
        new = (votes.withColumn("rk", F.row_number().over(w))
               .where(F.col("rk") == 1).select("doc_id", "label"))
        labels = (docs.select("doc_id")
                  .join(new, "doc_id", "left")
                  .select("doc_id",
                          F.coalesce("label", F.col("doc_id"))
                          .alias("label"))
                  .localCheckpoint(eager=True))
    return labels


def hyperball_registers(docs: DataFrame) -> DataFrame:
    """Initial HyperLogLog registers, one sparse row per node: each node
    hashes ITSELF into one of m=16 registers (b=4). The 64-bit hash is
    the engine-standard md5-prefix integer (60 bits); register index =
    low 4 bits, rho = 1 + number of trailing zeros of the remaining 56
    bits (computed exactly as bit_count(lsb - 1) + 1 — no float log2,
    so Spark and any SQL replay agree bit-for-bit)."""
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
               16, 10).cast("long")
    d = docs.select(F.col("doc_id").alias("v"), h.alias("h"))
    y = F.shiftrightunsigned("h", 4)
    lsb = y.bitwiseAND(-y)
    rho = F.when(y == 0, F.lit(57)) \
        .otherwise(F.bit_count(lsb - 1) + 1).cast("int")
    return d.select("v", (F.col("h").bitwiseAND(F.lit(15)))
                    .cast("int").alias("j"), rho.alias("r"))


_HB_ALPHA16 = 0.673                 # Flajolet et al. 2007, m = 16
_HB_POW57 = float(1 << 57)


def _hb_estimate(regs: DataFrame) -> DataFrame:
    """-> (v, est): HLL cardinality estimate from sparse registers.
    The register sum is EXACT 64-bit integer math — sum_j 2^(57 - M_j)
    with absent registers contributing 2^57 — so both engines derive the
    same double before the one shared division; the small-range
    correction (V > 0 and raw <= 2.5 m -> m ln(m / V)) matches the
    original HLL paper."""
    s = regs.groupBy("v").agg(
        (F.sum(F.expr("shiftleft(cast(1 as bigint), 57 - r)"))
         + (16 - F.count("*")) * F.lit(1 << 57).cast("long")).alias("s"),
        (16 - F.count("*")).cast("int").alias("zeros"))
    raw = F.lit(_HB_ALPHA16 * 256.0 * _HB_POW57) / F.col("s").cast("double")
    small = F.lit(16.0) * F.log(F.lit(16.0) / F.col("zeros"))
    return s.select(
        "v", F.when((F.col("zeros") > 0) & (raw <= 40.0), small)
        .otherwise(raw).alias("est"))


def hyperball_harmonic(docs: DataFrame, rounds: int = 4) -> DataFrame:
    """-> (doc_id, b1_r..b{rounds}_r, harm_r): HyperBall (Boldi & Vigna
    2013, "In-core computation of geometric centralities with
    HyperBall") over the deterministic link graph — per-node HLL
    counters of the out-ball B(v, t), grown by one synchronous
    max-merge round per radius, with harmonic centrality estimated as
    sum_t (|B(v,t)| - |B(v,t-1)|) / t.

    Scale shape: registers are SPARSE (v, j, rho) rows — 16 per node at
    most — and every round is one shuffle join of the register table
    against the edge list on dst followed by a map-side-combined
    groupBy(v, j) max: the same plan PageRank runs, with a 16x key
    fan-out instead of a double vector. No per-node state ever exceeds
    16 rows, so a 10^12-node graph shards by v with no skew beyond the
    in-degree distribution; the register table localCheckpoints per
    round (two consumers: merge + estimate)."""
    n = docs.count()
    edges = link_edges(docs, n).localCheckpoint(eager=True)
    regs = hyperball_registers(docs).localCheckpoint(eager=True)
    ests = [_hb_estimate(regs).withColumnRenamed("est", "e0")]
    for t in range(1, rounds + 1):
        succ = (edges.join(regs, edges["dst"] == regs["v"])
                .select(F.col("src").alias("v"), "j", "r"))
        regs = (regs.unionAll(succ).groupBy("v", "j")
                .agg(F.max("r").alias("r"))
                .localCheckpoint(eager=True))
        ests.append(_hb_estimate(regs).withColumnRenamed("est", f"e{t}"))
    out = ests[0]
    for t in range(1, rounds + 1):
        out = out.join(ests[t], "v")
    harm = sum((F.col(f"e{t}") - F.col(f"e{t-1}")) / float(t)
               for t in range(1, rounds + 1))
    cols = [F.round(F.col(f"e{t}"), 6).alias(f"b{t}_r")
            for t in range(1, rounds + 1)]
    return out.select(F.col("v").alias("doc_id"), *cols,
                      F.round(harm, 6).alias("harm_r"))


def link_components(docs: DataFrame, max_rounds: int = 16) -> DataFrame:
    """-> (component, n_pages): weakly connected components of the link
    graph by iterative min-label propagation over the SYMMETRIZED edge
    list — each round one shuffle join labels x edges + a
    map-side-combined min per node, localCheckpointed; converges when no
    label changes. Plain min-label propagation needs ~diameter rounds
    (NOT O(log diameter) — that requires star-contraction variants), so
    a graph whose propagation distance exceeds max_rounds would return
    split components: the loop RAISES rather than return wrong output.
    component = min doc_id of the component; isolated pages form
    singletons."""
    n = docs.count()
    e = link_edges(docs, n)
    edges = (e.unionAll(e.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst")))
             .distinct().localCheckpoint(eager=True))
    lbl = docs.select(F.col("doc_id"),
                      F.col("doc_id").alias("cluster"))
    changed = 1
    for _ in range(max_rounds):
        lbl = lbl.localCheckpoint(eager=True)
        nxt = (edges.join(lbl, edges["src"] == lbl["doc_id"])
               .groupBy("dst").agg(F.min("cluster").alias("nmin")))
        new = (lbl.withColumnRenamed("cluster", "old")
               .join(nxt, lbl["doc_id"] == nxt["dst"], "left")
               .select("doc_id", "old",
                       F.least("old", F.coalesce(
                           "nmin", F.lit(1 << 62))).alias("cluster")))
        changed = new.where(F.col("old") != F.col("cluster")) \
            .limit(1).count()
        lbl = new.select("doc_id", "cluster")
        if changed == 0:
            break
    if changed:
        raise RuntimeError(
            f"link_components: labels still changing after {max_rounds} "
            "rounds (graph propagation distance exceeds max_rounds); "
            "raise max_rounds — returning now would split components")
    return (lbl.groupBy("cluster").agg(F.count("*").cast("long")
                                       .alias("n_pages"))
            .select(F.col("cluster").alias("component"), "n_pages"))
