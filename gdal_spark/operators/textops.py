"""Training-data text operators over the documents/pages tables.

All pure built-in column expressions (whole-stage codegen; zero Python in the
hot path) — deduplication fingerprints, MinHash/LSH, SimHash, n-gram Jaccard,
token/quality stats, language-ID heuristic, rolling-hash fingerprints.

Scale notes (100 TB):
  * every op here is map-side until its final groupBy — shingle explosion is
    a flatMap fused into the scan, and the MinHash groupBy is a partial-agg
    (min/sum combine map-side) so the shuffle carries one row per document,
    not one per shingle;
  * hashing uses md5 (deterministic, engine-portable) — fingerprints computed
    here are reproducible in any ANSI SQL engine, which is what the DuckDB
    oracle checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MINHASH_PERMS = 4
SHINGLE_K = 3
STOPWORDS = ("the", "a", "of", "and", "to", "in")

# language marker words for the n-gram/stopword language-ID heuristic
LANG_MARKERS = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "es": ("el", "la", "y"),
    "zh": ("de", "le", "he"),
}


def words_col(text="text"):
    return F.split(F.col(text), " ")


def exact_fingerprint(docs: DataFrame) -> DataFrame:
    """Exact-dup fingerprint groups: md5 of full text (hash-groupBy dedup)."""
    return (docs.select(F.md5(F.col("text")).alias("fp"), "doc_id")
            .groupBy("fp")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.min("doc_id").alias("keeper")))


def norm_fingerprint(docs: DataFrame) -> DataFrame:
    """Near-dup fingerprint on a normalized prefix (cheap canonicalization)."""
    norm = F.md5(F.substring(F.lower(F.col("text")), 1, 40))
    return (docs.select(norm.alias("fp"), "doc_id")
            .groupBy("fp")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.min("doc_id").alias("keeper")))


def shingles(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, sh) — word k-shingles. flatMap fused into the scan."""
    d = docs.select("doc_id", words_col().alias("ws")).where(F.size("ws") >= k)
    i = F.explode(F.sequence(F.lit(1), F.size("ws") - (k - 1))).alias("i")
    d = d.select("doc_id", "ws", i)
    parts = [F.element_at("ws", F.col("i") + j) for j in range(k)]
    return d.select("doc_id", F.concat_ws(" ", *parts).alias("sh"))


def minhash_bands(docs: DataFrame, perms: int = MINHASH_PERMS) -> DataFrame:
    """(doc_id, band) — MinHash signature folded into one LSH band key.

    Permutation j = md5("{j}:" + shingle); signature = min per doc;
    band = md5(sig_0 | ... | sig_{p-1}). Docs sharing the band are near-dup
    candidates. The groupBy is partial-aggregated (min combines map-side).
    """
    sh = shingles(docs)
    sigs = sh.groupBy("doc_id").agg(*[
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("sh")))).alias(f"sig{j}")
        for j in range(perms)])
    band = F.md5(F.concat_ws("|", *[f"sig{j}" for j in range(perms)]))
    return sigs.select("doc_id", band.alias("band"))


def minhash_clusters(docs: DataFrame) -> DataFrame:
    return (minhash_bands(docs).groupBy("band")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.min("doc_id").alias("keeper")))


def simhash16(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 16-bit SimHash over word hashes (majority vote per
    bit). h(word) = first 16 bits of md5; bit b of the fingerprint is set when
    sum over words of (bit_b(h) ? +1 : -1) > 0."""
    w = docs.select("doc_id", F.explode(words_col()).alias("w"))
    h = F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("long")
    w = w.select("doc_id", h.alias("h"))
    aggs = [F.sum((F.shiftright("h", b).bitwiseAND(F.lit(1))) * 2 - 1).alias(f"s{b}")
            for b in range(16)]
    s = w.groupBy("doc_id").agg(*aggs)
    fp = None
    for b in range(16):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return s.select("doc_id", fp.cast("long").alias("simhash"))


def consecutive_jaccard(docs: DataFrame) -> DataFrame:
    """(doc_id, jacc) — word-set Jaccard of doc i vs doc i+1 (rounded 6dp).

    The self-join is an equi-join on doc_id (shuffle-free if the source is
    bucketed by doc_id; partial-agg distinct counts otherwise)."""
    w = docs.select("doc_id",
                    F.explode(F.array_distinct(words_col())).alias("w"))
    sizes = w.groupBy("doc_id").agg(F.count("*").cast("long").alias("nd"))
    nxt = w.select((F.col("doc_id") - 1).alias("doc_id"), "w")
    inter = (w.join(nxt, ["doc_id", "w"]).groupBy("doc_id")
             .agg(F.count("*").cast("long").alias("ni")))
    a = sizes.alias("a")
    b = sizes.select((F.col("doc_id") - 1).alias("doc_id"),
                     F.col("nd").alias("nd_b"))
    j = (a.join(b, "doc_id").join(inter, "doc_id", "left")
         .withColumn("ni", F.coalesce("ni", F.lit(0))))
    jacc = F.round(F.col("ni").cast("double")
                   / (F.col("nd") + F.col("nd_b") - F.col("ni")), 6)
    return j.select("doc_id", jacc.alias("jacc"))


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token count, char count, mean token length, stopword ratio."""
    ws = words_col()
    n_tok = F.size(ws).cast("long")
    stop = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS))).cast("long")
    avg_wlen = F.round((F.length("text") - (n_tok - 1)).cast("double") / n_tok, 6)
    return docs.select(
        "doc_id", n_tok.alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_t"),
        avg_wlen.alias("avg_wlen"),
        stop.alias("n_stop"),
        F.round(stop.cast("double") / n_tok, 6).alias("stop_ratio"))


def quality_score(docs: DataFrame) -> DataFrame:
    """Gopher/C4-style document quality signals + keep flag, all JVM column
    math (no UDF): word count, mean word length, stopword ratio, unique-word
    ratio, and top-word dominance (the repetition signal — most frequent
    word's share). keep=1 iff every signal is inside the quality envelope:
    30 <= n_words <= 95, uniq_ratio >= 0.35, top_frac <= 0.15,
    stop_ratio >= 0.02.

    The dominance term stays JVM-side via higher-order functions:
    array_max(transform(distinct_words, w -> count of w)) — O(u*n) per doc,
    bounded by document length, no shuffle beyond the scan."""
    ws = words_col()
    nw = F.size(ws).cast("long")
    awl = (F.length("text") - (nw - 1)).cast("double") / nw
    stop = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS)))
    sr = stop.cast("double") / nw
    uniq = F.array_distinct(ws)
    uq = F.size(uniq).cast("double") / nw
    top = F.array_max(F.transform(
        uniq, lambda w: F.size(F.filter(ws, lambda x: x == w))))
    tf = top.cast("double") / nw
    keep = ((nw >= 30) & (nw <= 95) & (uq >= 0.35) & (tf <= 0.15)
            & (sr >= 0.02)).cast("int")
    return docs.select(
        "doc_id", nw.alias("n_words"),
        F.round(awl, 6).alias("avg_wlen_r"),
        F.round(sr, 6).alias("stop_ratio_r"),
        F.round(uq, 6).alias("uniq_ratio_r"),
        F.round(tf, 6).alias("top_frac_r"),
        keep.alias("keep"))


def langid_col(text: str = "text"):
    """Marker-word language prediction as ONE Column expression
    (alphabetical-first deterministic tie-break), all JVM column math —
    usable on unlabeled text (e.g. fresh WARC ingest)."""
    def _score(markers):
        # NB: the filter lambda must be unary — PySpark treats a second
        # parameter as the element index.
        return F.size(F.filter(words_col(text), lambda w: w.isin(*markers)))

    scores = {lang: _score(markers) for lang, markers in LANG_MARKERS.items()}
    langs = sorted(LANG_MARKERS)  # deterministic tie-break: alphabetical
    pred = F.lit(langs[0])
    best = scores[langs[0]]
    for lang in langs[1:]:
        pred = F.when(scores[lang] > best, F.lit(lang)).otherwise(pred)
        best = F.when(scores[lang] > best, scores[lang]).otherwise(best)
    return pred


def langid_pred(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, pred) — per-document marker-word language
    prediction against the labeled column."""
    return docs.select("doc_id", "lang", langid_col().alias("pred"))


def langid(docs: DataFrame) -> DataFrame:
    """Marker-word language scores -> predicted lang; confusion counts vs the
    labeled `lang` column."""
    return langid_pred(docs).groupBy("lang", "pred") \
        .agg(F.count("*").cast("long").alias("n"))


def rolling_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) — position-weighted polynomial rolling hash mod p."""
    P = 1000000007
    w = docs.select("doc_id", F.posexplode(words_col()).alias("pos", "w"))
    h = F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long") % P
    term = ((F.col("pos") + 1) * h) % P
    return (w.select("doc_id", term.alias("t"))
            .groupBy("doc_id").agg((F.sum("t") % P).alias("fp")))


def cms_heavy_hitters(docs: DataFrame, width: int = 1024,
                      depth: int = 4, k: int = 20) -> DataFrame:
    """Count-Min sketch heavy hitters (Cormode & Muthukrishnan 2005):
    build a depth x width CMS over the token stream (row j hashes token
    w to bucket md5(j || '|' || w) % width), then report the exact top-k
    tokens with their sketch estimates min_j sketch[j][bucket_j(w)].
    -> (w, n_exact, cms_est), deterministic tiebreak (count desc, token
    asc). The CMS one-sided guarantee cms_est >= n_exact always holds;
    the overestimate is bounded by colliding mass.

    Distribution: the sketch is depth map-side-combined groupBys over
    the exploded token stream (depth*width cells total — broadcastable
    at any corpus size, the whole point of the sketch); the top-k probe
    joins k*depth rows against those cells. Deterministic md5 bucket
    arithmetic replays verbatim in SQL."""
    toks = docs.select(F.explode(words_col()).alias("w"))
    exact = toks.groupBy("w").agg(F.count("*").cast("long")
                                  .alias("n_exact"))
    top = exact.orderBy(F.desc("n_exact"), F.asc("w")).limit(k)

    def bucket(j: int, col):
        return F.conv(F.substring(
            F.md5(F.concat(F.lit(str(j) + "|"), col)), 1, 8),
            16, 10).cast("long") % width

    js = list(range(depth))
    cells = None
    for j in js:
        c = (toks.select(bucket(j, F.col("w")).alias("b"))
             .groupBy("b").agg(F.count("*").cast("long").alias("s"))
             .select(F.lit(j).alias("j"), "b", "s"))
        cells = c if cells is None else cells.unionByName(c)
    probes = top.select(
        "w", "n_exact",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     bucket(j, F.col("w")).alias("b")) for j in js]))
        .alias("p")).select("w", "n_exact", "p.j", "p.b")
    est = (probes.join(F.broadcast(cells), ["j", "b"])
           .groupBy("w", "n_exact").agg(F.min("s").alias("cms_est")))
    return est.select("w", "n_exact", "cms_est")


def jaccard_prefix_join(docs: DataFrame, num: int = 3,
                        den: int = 5) -> DataFrame:
    """EXACT all-pairs Jaccard similarity join at threshold tau=num/den
    via prefix filtering (Chaudhuri et al. 2006; Bayardo et al. 2007
    "Scaling up all pairs similarity search") — the exact counterpart to
    the MinHash-LSH family: -> (a, b, inter, union_, jacc_r) for every
    pair with J(a, b) >= tau.

    Plan: distinct token sets, global token order by ascending document
    frequency (rarest first), per-doc prefix of length len - t + 1 with
    t = ceil(tau*len) computed in EXACT integer arithmetic ((num*len +
    den - 1) div den — no float ceil off-by-one at the boundary), an
    equi-join on prefix tokens for candidates (plus the length-ratio
    filter tau*la <= lb), then exact verification by rank-array
    intersection. The threshold test is the integer comparison
    inter * den >= num * union, so Spark and the brute-force SQL oracle
    agree exactly. The candidate join never enumerates all pairs — only
    pairs sharing a rare prefix token; the frequency-ranked vocab table
    is vocabulary-sized and broadcast (its one-partition row_number sort
    is vocab-bounded, not corpus-bounded)."""
    from pyspark.sql import Window
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(words_col())).alias("w"))
    dfreq = toks.groupBy("w").agg(F.count("*").alias("df"))
    ranked = dfreq.select(
        "w", F.row_number().over(Window.orderBy("df", "w")).alias("rk"))
    tr = toks.join(F.broadcast(ranked), "w").select("doc_id", "rk")
    sets = tr.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("rk")).alias("rks"))
    sets = sets.select("doc_id", "rks", F.size("rks").alias("len"))
    # t = ceil(tau*len) in exact integer arithmetic; prefix = len - t + 1
    t_of = F.expr(f"({num} * len + {den - 1}) DIV {den}")
    sets = sets.select("doc_id", "rks", "len",
                       (F.col("len") - t_of + 1).cast("int").alias("plen"))
    pref = sets.select(
        "doc_id", "len",
        F.explode(F.slice("rks", 1, F.col("plen"))).alias("rk"))
    la, lb = pref.alias("la"), pref.alias("lb")
    cand = (la.join(lb, "rk")
            .where(F.col("la.doc_id") < F.col("lb.doc_id"))
            .where(F.col("lb.len") * den >= num * F.col("la.len"))
            .where(F.col("la.len") * den >= num * F.col("lb.len"))
            .select(F.col("la.doc_id").alias("a"),
                    F.col("lb.doc_id").alias("b"))
            .distinct())
    sa = sets.select(F.col("doc_id").alias("a"),
                     F.col("rks").alias("ra"), F.col("len").alias("na"))
    sb = sets.select(F.col("doc_id").alias("b"),
                     F.col("rks").alias("rb"), F.col("len").alias("nb"))
    v = (cand.join(sa, "a").join(sb, "b")
         .select("a", "b",
                 F.size(F.array_intersect("ra", "rb")).alias("inter"),
                 (F.col("na") + F.col("nb")).alias("lab")))
    v = v.select("a", "b", "inter",
                 (F.col("lab") - F.col("inter")).alias("union_"))
    out = v.where(F.col("inter") * den >= num * F.col("union_"))
    return out.select(
        "a", "b", F.col("inter").cast("long").alias("inter"),
        F.col("union_").cast("long").alias("union_"),
        F.round(F.col("inter") / F.col("union_"), 6).alias("jacc_r"))


def hll_distinct(docs: DataFrame) -> DataFrame:
    """HyperLogLog distinct-token estimate (Flajolet et al. 2007) with
    m = 256 registers over a 60-bit md5 hash: bucket = h mod 256, rank =
    1 + leading zeros of the remaining 52 bits, register = max rank.
    -> one row (n_exact, v_zero, hll_est_r, rel_err_r) with the exact
    distinct count alongside for calibration.

    Determinism across engines: the harmonic-mean denominator sum
    2^-M[b] is computed as the EXACT integer sum of 2^(53-M[b]) (BIGINT,
    <= 2^61 for 256 registers) so no float-accumulation order can differ
    between Spark and the SQL oracle; the single final division and the
    small-range linear-counting branch are replayed with identical
    arithmetic. Scale: the sketch is one map-side-combined groupBy to
    256 rows — the mergeable-summary shape that makes distinct counting
    feasible on a 10^12-token stream."""
    m = 256
    alpha = 0.7213 / (1 + 1.079 / m)
    amm = alpha * m * m * float(1 << 53)
    spark = docs.sparkSession
    t = docs.select(F.explode(words_col()).alias("w"))
    hh = t.select(F.conv(F.substring(F.md5("w"), 1, 15), 16, 10)
                  .cast("long").alias("h"))
    s2 = hh.select((F.col("h") % m).alias("b"),
                   F.expr("h DIV 256").alias("rest"))
    rank = F.when(F.col("rest") == 0, F.lit(53)) \
        .otherwise(F.lit(53) - F.length(F.bin("rest")))
    regs = s2.select("b", rank.alias("r")).groupBy("b") \
        .agg(F.max("r").alias("m"))
    allb = spark.range(m).select(F.col("id").alias("b"))
    full = allb.join(regs, "b", "left") \
        .select(F.coalesce("m", F.lit(0)).alias("m"))
    agg = full.agg(
        F.sum(F.expr("CAST(1 AS BIGINT) << CAST(53 - m AS INT)"))
        .alias("s"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).cast("long")
        .alias("v"))
    ex = t.agg(F.count_distinct("w").alias("n_exact"))
    est = F.when((F.lit(amm) / F.col("s") <= 2.5 * m) & (F.col("v") > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v"))) \
        .otherwise(F.lit(amm) / F.col("s"))
    return (agg.crossJoin(ex)
            .select("n_exact", F.col("v").alias("v_zero"),
                    F.round(est, 4).alias("hll_est_r"),
                    F.round(est / F.col("n_exact") - 1, 4)
                    .alias("rel_err_r")))


def winnowing_fingerprints(docs: DataFrame, k: int = 3,
                           w: int = 4) -> DataFrame:
    """Robust winnowing document fingerprints (Schleimer, Wilkerson &
    Aiken 2003 — the MOSS local fingerprinting algorithm): hash every
    word k-gram, slide a window of w consecutive gram hashes, select
    each window's minimum (rightmost position on ties), and dedupe the
    selections. -> distinct (doc_id, pos, fp_h). Guarantees: any shared
    substring of at least w+k-1 tokens yields at least one shared
    fingerprint, and within-document gaps between selections are at
    most w.

    Distribution: grams explode 1->m per doc; each gram replicates to at
    most w windows (bounded fan-out, no per-doc collect); the rightmost-
    min selection is two map-side-combined groupBys (min h per window,
    then max pos among rows equal to it) — the identical two-step runs
    in the SQL oracle. Documents shorter than w+k-1 tokens have no full
    window and are excluded (the paper's guarantee needs one)."""
    ws = words_col()
    n = F.size(ws)
    m = n - (k - 1)
    d = docs.where(n >= w + k - 1).select("doc_id", m.alias("m"), ws.alias("ws"))
    grams = d.select(
        "doc_id", "m",
        F.posexplode(F.transform(
            F.sequence(F.lit(1), F.col("m")),
            lambda i: F.concat_ws(" ", F.slice(F.col("ws"), i, k))))
        .alias("p0", "gram"))
    h = F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long") \
        % 1000000007
    grams = grams.select("doc_id", "m", (F.col("p0") + 1).alias("pos"),
                         h.alias("h"))
    wins = grams.select(
        "doc_id", "pos", "h",
        F.explode(F.sequence(
            F.greatest(F.lit(1), F.col("pos") - (w - 1)),
            F.least(F.col("pos"), F.col("m") - (w - 1)))).alias("q"))
    mins = wins.groupBy("doc_id", "q").agg(F.min("h").alias("mh"))
    sel = (wins.join(mins, ["doc_id", "q"])
           .where(F.col("h") == F.col("mh"))
           .groupBy("doc_id", "q", "mh").agg(F.max("pos").alias("pos")))
    return sel.select("doc_id", "pos", F.col("mh").alias("fp_h")).distinct()


# ---------------------------------------------------------------------------
# production-parameterized MinHash: 128 perms, 16 bands x 8 rows, CC merge
# ---------------------------------------------------------------------------

MINHASH128_PERMS = 128
MINHASH_BANDS = 16           # 16 bands x 8 rows
MH_PRIME = 1000000007


def shingle_hash_pairs(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, h1, h2) — two independent 28-bit hash components per
    shingle. Permutation j is the universal hash (h1 + j*h2) mod p
    (Broder/Carter-Wegman), so 128 permutations cost TWO md5s per shingle,
    not 128 — the standard production MinHash trick, and the arithmetic is
    reproducible verbatim in any SQL engine."""
    sh = shingles(docs, k)
    h1 = F.conv(F.substring(F.md5("sh"), 1, 7), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5("sh"), 9, 7), 16, 10).cast("long")
    return sh.select("doc_id", h1.alias("h1"), h2.alias("h2"))


def minhash_signatures(docs: DataFrame,
                       perms: int = MINHASH128_PERMS) -> DataFrame:
    """(doc_id, sig0..sig{perms-1}) — min over shingles of
    (h1 + j*h2) mod p. One groupBy, all mins combine map-side."""
    h = shingle_hash_pairs(docs)
    aggs = [F.min((F.col("h1") + j * F.col("h2")) % MH_PRIME).alias(f"sig{j}")
            for j in range(perms)]
    return h.groupBy("doc_id").agg(*aggs)


def minhash_band_keys(docs: DataFrame, perms: int = MINHASH128_PERMS,
                      bands: int = MINHASH_BANDS) -> DataFrame:
    """(doc_id, band, key) — b bands x r rows LSH banding: key = md5 over
    the band's r signature values. Docs sharing ANY band key are near-dup
    candidates; more bands -> higher recall at the same signature cost."""
    r = perms // bands
    sigs = minhash_signatures(docs, perms)
    entries = []
    for b in range(bands):
        key = F.md5(F.concat_ws(
            "|", *[F.col(f"sig{j}").cast("string")
                   for j in range(b * r, (b + 1) * r)]))
        entries.append(F.struct(F.lit(b).cast("int").alias("band"),
                                key.alias("key")))
    return (sigs.select("doc_id", F.explode(F.array(*entries)).alias("_bk"))
            .select("doc_id", F.col("_bk.band").alias("band"),
                    F.col("_bk.key").alias("key")))


def minhash_components(docs: DataFrame, perms: int = MINHASH128_PERMS,
                       bands: int = MINHASH_BANDS,
                       max_rounds: int = 16) -> DataFrame:
    """(doc_id, cluster) — connected components over the shared-band graph
    (cross-band cluster merge): iterative min-label propagation
    doc -> band-key -> doc, the same O(log diameter) loop the polygonize
    cross-tile merge uses. cluster = min doc_id of the component."""
    bk_all = minhash_band_keys(docs, perms, bands) \
        .select("doc_id", F.concat_ws(":", F.col("band").cast("string"),
                                      "key").alias("bkey")) \
        .localCheckpoint()       # hash once; three consumers below
    # iterate ONLY the collision subgraph: a band key held by a single
    # document can never change a label, and near-dup collisions are a
    # tiny fraction of the corpus — so the propagation loop shuffles
    # the collision rows, not all n_docs x bands keys (the fix for the
    # 0.58 dedup-stage scaling efficiency in CURATION_SCALING r04)
    collide = (bk_all.groupBy("bkey")
               .agg(F.count("*").alias("_n"))
               .where(F.col("_n") >= 2).select("bkey"))
    bk = bk_all.join(collide, "bkey") \
        .select("doc_id", "bkey").localCheckpoint()
    all_docs = bk_all.select("doc_id").distinct().localCheckpoint()
    lbl = bk.select("doc_id").distinct() \
        .withColumn("cluster", F.col("doc_id")) \
        .localCheckpoint()

    def hop(cur):
        bmin = (bk.join(cur, "doc_id")
                .groupBy("bkey").agg(F.min("cluster").alias("bmin")))
        nxt = (bk.join(bmin, "bkey")
               .groupBy("doc_id").agg(F.min("bmin").alias("nmin")))
        return (cur.join(nxt, "doc_id", "left")
                .select("doc_id",
                        F.least("cluster",
                                F.coalesce("nmin", F.lit(1 << 62)))
                        .alias("cluster")))

    # two propagation hops per materialized round: halves the number of
    # checkpoint+convergence jobs, whose fixed per-job cost is what
    # keeps small-cluster scaling efficiency down (CURATION_SCALING);
    # the label lattice is monotone, so extra hops are always safe
    rounds = 0
    while rounds < max_rounds:
        new = hop(hop(lbl))
        rounds += 2
        new = (lbl.withColumnRenamed("cluster", "old")
               .join(new, "doc_id")
               .select("doc_id", "old", "cluster")
               .localCheckpoint())        # materialize ONCE, then the
        # convergence probe below scans the checkpointed blocks instead
        # of re-executing the round's joins a second time
        changed = new.where(F.col("old") != F.col("cluster")) \
            .limit(1).count()
        lbl = new.select("doc_id", "cluster")
        if changed == 0:
            break
    else:
        import warnings
        warnings.warn("minhash_components: max_rounds exhausted before "
                      "convergence; components may be split")
    # non-colliding documents are their own (singleton) cluster
    return (all_docs.join(lbl, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("cluster", F.col("doc_id"))
                    .alias("cluster")))


def minhash_cc_clusters(docs: DataFrame) -> DataFrame:
    """(cluster, n_docs) — component sizes of the banded-MinHash dedup."""
    return (minhash_components(docs).groupBy("cluster")
            .agg(F.count("*").cast("long").alias("n_docs")))


def simhash64(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash_hi, simhash_lo) — 64-bit SimHash as two 32-bit
    words (signed-overflow-free in every engine). Word bits come from the
    first/second 8 hex chars of md5(word); bit b set when the +-1 majority
    vote over words is positive."""
    w = docs.select("doc_id", F.explode(words_col()).alias("w"))
    hi = F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(F.md5("w"), 9, 8), 16, 10).cast("long")
    w = w.select("doc_id", hi.alias("hh"), lo.alias("hl"))
    aggs = []
    for b in range(32):
        aggs.append(F.sum(
            (F.shiftright("hh", b).bitwiseAND(F.lit(1))) * 2 - 1)
            .alias(f"a{b}"))
        aggs.append(F.sum(
            (F.shiftright("hl", b).bitwiseAND(F.lit(1))) * 2 - 1)
            .alias(f"b{b}"))
    s = w.groupBy("doc_id").agg(*aggs)
    fp_hi = None
    fp_lo = None
    for b in range(32):
        th = F.when(F.col(f"a{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        tl = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp_hi = th if fp_hi is None else fp_hi + th
        fp_lo = tl if fp_lo is None else fp_lo + tl
    return s.select("doc_id", fp_hi.cast("long").alias("simhash_hi"),
                    fp_lo.cast("long").alias("simhash_lo"))


def line_dedup(docs: DataFrame, min_count: int = 2) -> DataFrame:
    """CCNet-style line-level deduplication: drop every line whose hash
    appears >= min_count times ACROSS THE CORPUS (boilerplate removal —
    nav bars, cookie banners, footers repeat across pages), then
    reassemble each document from its surviving lines in order.

    Pure built-in column ops: posexplode -> md5 -> corpus-wide count
    (one partial-aggregated groupBy) -> join back -> sort_array rebuild.
    The shuffle is keyed by line hash, so boilerplate lines combine
    map-side and the join back is an equi-join on the hash."""
    lines = docs.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "line"))
    lines = lines.withColumn("h", F.md5("line"))
    counts = lines.groupBy("h").agg(F.count("*").alias("_n"))
    kept = (lines.join(counts, "h")
            .where(F.col("_n") < min_count)
            .groupBy("doc_id")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("pos", "line"))),
                    lambda s: s["line"]), "\n").alias("text")))
    # documents whose every line was boilerplate keep an empty text
    return docs.select("doc_id").join(kept, "doc_id", "left") \
        .select("doc_id", F.coalesce("text", F.lit("")).alias("text"))


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
PII_IPV4_RE = (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b")


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction for training corpora (C4/CCNet-style scrub):
    replace e-mail addresses, E.164-ish phone numbers and IPv4 literals
    with typed placeholder tokens and report per-document match counts.

    Pure JVM regexp ops (regexp_count + regexp_replace inside whole-stage
    codegen) — at 100 TB this is a map-only stage fused into the scan; the
    patterns are RE2-compatible so the DuckDB oracle runs the SAME regexes.
    """
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, F.lit(PII_EMAIL_RE), F.lit("<EMAIL>")),
            F.lit(PII_PHONE_RE), F.lit("<PHONE>")),
        F.lit(PII_IPV4_RE), F.lit("<IP>"))
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).alias("n_email"),
        F.regexp_count(t, F.lit(PII_PHONE_RE)).alias("n_phone"),
        F.regexp_count(t, F.lit(PII_IPV4_RE)).alias("n_ip"),
        scrubbed.alias("scrubbed"),
    )


GEOPARSE_RE = r'geo:(-?[0-9]+);(-?[0-9]+)'


def geoparse(pages: DataFrame, html_col: str = "html_txt") -> DataFrame:
    """Geoparse stage of the web-pages pipeline: extract the coordinate
    mention embedded in each page's markup (a ``geo:ILAT;ILON`` microformat
    token carrying centi-degree integers) and materialize typed lon/lat
    doubles. Pages without a mention yield NULL coordinates (kept — the
    downstream spatial join filters).

    regexp_extract + CAST, all codegen'd; the 100-TB plan is scan -> map,
    no shuffle, no Python.
    """
    h = F.col(html_col)
    ilat = F.nullif(F.regexp_extract(h, GEOPARSE_RE, 1), F.lit("")) \
        .cast("long")
    ilon = F.nullif(F.regexp_extract(h, GEOPARSE_RE, 2), F.lit("")) \
        .cast("long")
    return pages.withColumn("plat", ilat / 100.0) \
                .withColumn("plon", ilon / 100.0)


GOPHER_NS = (2, 3, 4, 5, 10)


def repetition_signals(docs: DataFrame, ns=GOPHER_NS) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, Table A1 — public
    paper): per-document word-n-gram repetition signals.

    For each n, over the document's space-split word n-grams (joined back
    with single spaces, so a gram's character length includes its internal
    separators):

    - ``top{n}_r``  = max over distinct grams of count*len(gram) / n_chars
      ("fraction of characters contained within the most frequent n-gram";
      taking the max of the products makes ties deterministic).
    - ``dup{n}_r``  = sum over grams with count >= 2 of count*len(gram)
      / n_chars ("fraction of characters within duplicated n-grams";
      overlap-agnostic variant — characters shared by overlapping grams
      count once per gram, documented here and mirrored exactly by the
      SQL oracle).
    - ``keep`` = 1 iff top2<=0.20, top3<=0.18, top4<=0.16, dup5<=0.15,
      dup10<=0.10 (the paper's thresholds for those n).

    All JVM column math: the n-gram windows for every n are generated
    inside ONE scan with transform(sequence)/slice/array_join higher-order
    functions (one concat of per-n struct arrays, one explode), counted by
    a single (doc_id, n, gram) groupBy whose partial aggregation collapses
    repeats map-side, then pivoted back to one row per document. The
    100-TB plan is scan -> explode -> one shuffle keyed by (doc_id, n,
    gram) -> one shuffle by doc_id; no Python, no skew (keys are
    per-document)."""
    ws = words_col()
    nw = F.size(ws)

    # NB: the transform lambda must be UNARY — PySpark binds a second
    # parameter to the element index, so `lambda i, n=n` would silently
    # rebind n. A closure factory captures n safely.
    def _gram(n):
        return lambda i: F.struct(
            F.lit(n).alias("n"),
            F.array_join(F.slice(ws, i + 1, n), " ").alias("g"))

    parts = []
    for n in ns:
        idx = F.when(nw >= n, F.sequence(F.lit(0), nw - n)) \
            .otherwise(F.array().cast("array<int>"))
        parts.append(F.transform(idx, _gram(n)))
    ex = docs.select("doc_id",
                     F.col("n_chars").cast("double").alias("nc"),
                     F.explode(F.concat(*parts)).alias("s"))
    cnt = ex.groupBy("doc_id", "nc",
                     F.col("s.n").alias("n"), F.col("s.g").alias("g")) \
        .agg(F.count("*").alias("c"))
    chars = F.col("c") * F.length("g")
    per = cnt.groupBy("doc_id", "n").agg(
        (F.max(chars) / F.first("nc")).alias("top"),
        (F.coalesce(F.sum(F.when(F.col("c") >= 2, chars)), F.lit(0))
         / F.first("nc")).alias("dup"))
    wide = per.groupBy("doc_id").pivot("n", list(ns)) \
        .agg(F.first("top").alias("top"), F.first("dup").alias("dup"))

    def col(n, kind):
        return F.round(F.coalesce(F.col(f"{n}_{kind}"), F.lit(0.0)), 6)

    out = docs.select("doc_id").join(wide, "doc_id", "left")
    keep = ((col(2, "top") <= 0.20) & (col(3, "top") <= 0.18)
            & (col(4, "top") <= 0.16) & (col(5, "dup") <= 0.15)
            & (col(10, "dup") <= 0.10)).cast("int")
    sel = ["doc_id"]
    sel += [col(n, "top").alias(f"top{n}_r") for n in ns]
    sel += [col(n, "dup").alias(f"dup{n}_r") for n in ns]
    return out.select(*sel, keep.alias("keep"))


def filter_funnel(docs: DataFrame) -> DataFrame:
    """RefinedWeb/Gopher-style end-to-end training-data filter funnel:
    exact dedup (keep the lowest doc_id per byte-identical text) ->
    quality envelope (quality_score.keep) -> repetition gate
    (repetition_signals.keep) -> language match (marker prediction equals
    the labeled lang). Returns the survivor count after each stage — the
    shape every corpus-curation report shows.

    Each stage is a doc_id semi-join; the count aggregations are partial
    (map-side) and the stage frames share the one documents scan. At 100
    TB the funnel is 4 shuffles (dedup groupBy, two keep computations'
    internal shuffles, the langid map is shuffle-free) — nothing collects
    beyond the 5-row result."""
    base = docs.select("doc_id")
    s2 = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id")) \
        .select("doc_id")
    q = quality_score(docs).where("keep = 1").select("doc_id")
    r = repetition_signals(docs).where("keep = 1").select("doc_id")
    lg = langid_pred(docs).where(F.col("pred") == F.col("lang")) \
        .select("doc_id")
    s3 = s2.join(q, "doc_id", "left_semi")
    s4 = s3.join(r, "doc_id", "left_semi")
    s5 = s4.join(lg, "doc_id", "left_semi")
    out = None
    for nm, df in (("s1_total", base), ("s2_exact_dedup", s2),
                   ("s3_quality", s3), ("s4_repetition", s4),
                   ("s5_langid", s5)):
        c = df.agg(F.count("*").cast("long").alias("n_docs")) \
            .select(F.lit(nm).alias("stage"), "n_docs")
        out = c if out is None else out.unionByName(c)
    return out


def span_dedup(docs: DataFrame, k: int = 8, min_count: int = 2
               ) -> DataFrame:
    """ExactSubstr-style span deduplication (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — public
    paper), word-window variant: every k-word window whose exact text
    occurs >= min_count times ACROSS THE CORPUS marks its k positions
    covered; covered tokens are removed and each document reassembles
    from the survivors in order. (The paper removes 50-token repeated
    spans via a suffix array; the window-hash formulation reaches the
    same covered-span set for spans >= k and is join-parallel.)

    Plan: one scan -> window explode -> corpus-wide groupBy(gram) with
    map-side partial counts (boilerplate collapses before the shuffle)
    -> dup-gram equi-join back -> position-coverage explode -> anti-join
    -> per-doc ordered reassembly. At 100 TB the gram key would be
    md5(gram) (same result, fixed-width shuffle keys); the raw string key
    here keeps the SQL oracle byte-identical."""
    d = docs.select("doc_id", words_col().alias("ws"))
    nw = F.size("ws")
    toks = d.select("doc_id", F.posexplode("ws").alias("pos", "w"))
    starts = F.when(nw >= k, F.sequence(F.lit(0), nw - k)) \
        .otherwise(F.array().cast("array<int>"))
    grams = d.select(
        "doc_id",
        F.explode(F.transform(
            starts,
            lambda i: F.struct(
                i.alias("start"),
                F.array_join(F.slice("ws", i + 1, k), " ")
                .alias("gram")))).alias("s")) \
        .select("doc_id", "s.start", "s.gram")
    dup = grams.groupBy("gram").agg(F.count("*").alias("_n")) \
        .where(F.col("_n") >= min_count).select("gram")
    cov = grams.join(dup, "gram") \
        .select("doc_id", F.explode(
            F.sequence(F.col("start"), F.col("start") + (k - 1)))
            .alias("pos")) \
        .distinct()
    kept = toks.join(cov, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "w"))),
            lambda s: s["w"]), " ").alias("text"),
        F.count("*").cast("long").alias("n_kept"))
    base = docs.select("doc_id", F.size(words_col()).cast("long")
                       .alias("_nw"))
    return base.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("text", F.lit("")).alias("text"),
        (F.col("_nw") - F.coalesce("n_kept", F.lit(0)))
        .alias("n_removed"))


C4_POLICY_PHRASES = ("terms of use", "privacy policy", "cookie policy",
                     "uses cookies")


def c4_filters(docs: DataFrame, min_words: int = 5,
               min_lines: int = 3, text_col: str = "text") -> DataFrame:
    """C4 cleaning heuristics (Raffel et al. 2020 §2.2, the public C4
    recipe) as pure JVM column math — no UDF, no shuffle beyond the scan:

      line level — keep a line only if it (a) ends in terminal
      punctuation (``. ! ? "``), (b) has >= `min_words` space-separated
      tokens, (c) does not contain the token ``javascript``, and (d)
      mentions no policy boilerplate phrase (terms of use / privacy
      policy / cookie policy / uses cookies);

      page level — drop the whole page if it contains ``lorem ipsum``
      or a curly brace ``{`` anywhere, or if fewer than `min_lines`
      lines survive the line filters.

    Returns (doc_id, n_lines, n_kept, keep, text) where `text` is the
    surviving lines rejoined by newline ('' for dropped pages). At 100 TB
    this is a map-only pass: higher-order array functions over the split
    lines, whole-stage codegen end to end."""
    lines = F.split(F.col(text_col), "\n")

    def _keep_line(ln):
        low = F.lower(ln)
        pol = F.lit(False)
        for p in C4_POLICY_PHRASES:
            pol = pol | low.contains(p)
        js = F.array_contains(F.split(low, " "), "javascript")
        return (ln.rlike('[.!?"]$')
                & (F.size(F.split(ln, " ")) >= min_words) & ~js & ~pol)

    kept = F.filter(lines, _keep_line)
    low_all = F.lower(F.col(text_col))
    clean = (~low_all.contains("lorem ipsum")
             & ~F.col(text_col).contains("{"))
    page_keep = clean & (F.size(kept) >= min_lines)
    return docs.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        page_keep.cast("int").alias("keep"),
        F.when(page_keep, F.array_join(kept, "\n"))
         .otherwise(F.lit("")).alias("text"))


BLOOM_M_BITS = 1 << 20       # filter size (bits)
BLOOM_K = 3                  # hash functions per element


def _bloom_positions(docs: DataFrame, k_hashes: int, m_bits: int,
                     shingle_k: int) -> DataFrame:
    """(doc_id, sh, pos) — the k Bloom bit positions of every word
    k-shingle, via the same (h1 + j*h2) universal-hash family MinHash
    uses (two md5s per shingle, k positions for free)."""
    sh = shingles(docs, shingle_k).dropDuplicates(["doc_id", "sh"])
    h1 = F.conv(F.substring(F.md5("sh"), 1, 7), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5("sh"), 9, 7), 16, 10).cast("long")
    ps = F.array(*[(h1 + j * h2) % m_bits for j in range(k_hashes)])
    return sh.select("doc_id", "sh", F.explode(ps).alias("pos"))


def bloom_build(docs: DataFrame, k_hashes: int = BLOOM_K,
                m_bits: int = BLOOM_M_BITS,
                shingle_k: int = 5) -> DataFrame:
    """Distributed Bloom filter over a corpus's word shingles.

    The bitmap is never materialized on the driver: bit positions pack
    into 32-bit words ((pos div 32) -> bit_or of (1 << pos%32)) and the
    aggregation is a partial-combine groupBy — the filter comes back as a
    DataFrame of at most m_bits/32 (word_idx, w) rows, small enough to
    broadcast however large the corpus that built it was. 32-bit words
    keep every mask positive in a BIGINT, so the identical arithmetic
    runs in any SQL engine (the DuckDB oracle replays it verbatim)."""
    p = _bloom_positions(docs, k_hashes, m_bits, shingle_k)
    word = F.expr("pos div 32").alias("word_idx")
    mask = F.expr("cast(shiftleft(1L, cast(pos % 32 as int)) as bigint)")
    return (p.select(word, mask.alias("m"))
             .groupBy("word_idx").agg(F.bit_or("m").alias("w")))


def bloom_contaminated(cands: DataFrame, bloom: DataFrame,
                       k_hashes: int = BLOOM_K, m_bits: int = BLOOM_M_BITS,
                       shingle_k: int = 5) -> DataFrame:
    """Benchmark-decontamination check (the Bloom-filter variant used by
    large-corpus training pipelines): flag every candidate document whose
    ANY word k-shingle is (probably) present in the reference corpus the
    filter was built from.

    Per candidate shingle the k bit positions broadcast-join the bloom's
    word table; a shingle "hits" iff all k bits are set. Map-only over
    the candidate corpus + one broadcast hash join — no shuffle of
    candidate data, no driver bitmap; false positives are the Bloom
    trade-off (rate (1-e^{-kn/m})^k) and are bit-reproducible here."""
    from pyspark.sql.functions import broadcast

    p = _bloom_positions(cands, k_hashes, m_bits, shingle_k)
    p = p.withColumn("word_idx", F.expr("pos div 32")) \
         .withColumn("m", F.expr(
             "cast(shiftleft(1L, cast(pos % 32 as int)) as bigint)"))
    j = p.join(broadcast(bloom), "word_idx", "left")
    hit = (F.col("w").isNotNull()
           & (F.col("w").bitwiseAND(F.col("m")) == F.col("m"))).cast("int")
    grams = (j.groupBy("doc_id", "sh")
              .agg((F.sum(hit) == k_hashes).cast("int").alias("g_in")))
    return (grams.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_grams"),
                 F.sum("g_in").cast("long").alias("n_hit_grams"),
                 F.max("g_in").cast("int").alias("contaminated")))


def _fix_mojibake_str(s: str, rounds: int = 2) -> str:
    """ftfy-style repair of UTF-8 text that was mis-decoded as
    cp1252/latin-1 ("cafÃ©" -> "café"). Try re-encoding with each legacy
    codec and decoding as UTF-8; keep the result only when the full
    round trip succeeds. Up to `rounds` passes undo double-mojibake.
    Non-mojibake text is a fixed point: pure ASCII round-trips to
    itself, and genuine legacy characters fail the UTF-8 decode, so the
    original string is kept."""
    for _ in range(rounds):
        fixed = None
        for enc in ("cp1252", "latin-1"):
            try:
                cand = s.encode(enc).decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                continue
            fixed = cand
            break
        if fixed is None or fixed == s:
            break
        s = fixed
    return s


def fix_mojibake(docs: DataFrame, text_col: str = "text",
                 rounds: int = 2) -> DataFrame:
    """(doc_id, text, changed) — mojibake-repaired text. Arrow-batched
    pandas UDF (string codec work has no JVM builtin); map-only, no
    shuffle — at 100 TB this pass is bounded by scan bandwidth."""
    @F.pandas_udf("string")
    def fix(s):
        return s.map(lambda t: _fix_mojibake_str(t, rounds)
                     if t is not None else None)

    out = docs.withColumn("__fixed", fix(F.col(text_col)))
    return out.select(
        "doc_id", F.col("__fixed").alias(text_col),
        (F.col("__fixed") != F.col(text_col)).cast("int").alias("changed"))


def hash_sample(docs: DataFrame, rate: float,
                key_col: str = "doc_id") -> DataFrame:
    """Deterministic hash sampling — the reproducible (and any-engine
    replayable) alternative to rand() for corpus subsetting: keep a row
    iff md5(key) mod 1e6 < rate*1e6. Stable across runs, cluster sizes
    and engines; map-only."""
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8),
               16, 10).cast("long")
    return docs.where((h % 1000000) < int(rate * 1000000))


def vocab_topk(docs: DataFrame, k: int = 200) -> DataFrame:
    """(w, n, rank) — corpus token frequencies, top k (tokenizer/BPE
    vocabulary prep). The groupBy combines map-side (one row per distinct
    word reaches the shuffle) and the top-k is TakeOrdered — no global
    window, no single-partition sort of the full vocabulary."""
    from pyspark.sql import Window

    w = docs.select(F.explode(words_col()).alias("w"))
    c = w.groupBy("w").agg(F.count("*").cast("long").alias("n"))
    top = c.orderBy(F.desc("n"), F.asc("w")).limit(k)
    win = Window.orderBy(F.desc("n"), F.asc("w"))   # k rows only
    return top.withColumn("rank",
                          F.row_number().over(win).cast("long"))


def bigram_lm_scores(docs: DataFrame, k_smooth: float = 0.5) -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al. 2020 use a KenLM
    5-gram; the same machinery at bigram order keeps every probability
    an exact corpus statistic): train an add-k-smoothed bigram model on
    the corpus ITSELF, score each document by per-token cross-entropy,
    and report perplexity (the head/middle/tail bucketing cut).

    Distribution: bigram/unigram counts are map-side-combined groupBys
    over exploded token pairs. The UNIGRAM table is vocabulary-sized and
    broadcasts; the BIGRAM table is unique-pair-sized — a large fraction
    of corpus tokens at web scale — so it joins via a normal shuffle
    equi-join on (a, b) and must NOT be broadcast. Both probe sides are
    already exploded to bigram granularity, so the shuffle is the same
    key the counts aggregated on. Every arithmetic step is replayable in
    SQL, so the oracle value-hashes the scores."""
    ws = words_col()
    n = F.size(ws)
    pairs = docs.select(
        "doc_id",
        F.explode(F.arrays_zip(F.slice(ws, 1, n - 1),
                               F.slice(ws, 2, n - 1))).alias("p")) \
        .select("doc_id", F.col("p.0").alias("a"), F.col("p.1").alias("b"))
    uni = docs.select(F.explode(ws).alias("a")) \
        .groupBy("a").agg(F.count("*").cast("double").alias("n_a"))
    vocab = uni.count()
    bi = pairs.groupBy("a", "b") \
        .agg(F.count("*").cast("double").alias("n_ab"))
    scored = (pairs.join(bi, ["a", "b"])
              .join(F.broadcast(uni), "a")
              .withColumn("logp", F.log(
                  (F.col("n_ab") + k_smooth)
                  / (F.col("n_a") + k_smooth * vocab))))
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        (-F.avg("logp")).alias("xent"))
    return per_doc.select("doc_id", "n_bigrams",
                          F.round("xent", 6).alias("xent_r"),
                          F.round(F.exp("xent"), 4).alias("ppl_r"))


def kneser_ney_scores(docs: DataFrame,
                      discount: float = 0.75) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; the
    smoothing KenLM uses, here at bigram order so every probability is
    an exact corpus statistic): absolute discount d on the bigram MLE,
    with the stolen mass backed off to the CONTINUATION unigram — how
    many distinct contexts a word follows, not how often it occurs:

        p(b|a) = max(c(a,b) - d, 0)/c(a.) + d*N1+(a.)/c(a.) * pc(b)
        pc(b)  = N1+(.b) / N1+(..)

    -> (doc_id, n_bigrams, kn_xent_r, kn_ppl_r) per-document
    cross-entropy/perplexity under the corpus-trained model.

    Distribution: c(a,b) is a map-side-combined groupBy; c(a.), N1+(a.)
    and N1+(.b) are second-stage aggregates OF that table (unique-pair
    input, not token instances). The context/continuation tables are
    vocabulary-sized and broadcast; the bigram-count table is
    unique-pair-sized and joins via a shuffle equi-join on (a, b) — the
    same key it aggregated on. Trained on the corpus itself, every
    scored bigram exists in the table, so no zero-probability path."""
    ws = words_col()
    n = F.size(ws)
    pairs = docs.select(
        "doc_id",
        F.explode(F.arrays_zip(F.slice(ws, 1, n - 1),
                               F.slice(ws, 2, n - 1))).alias("p")) \
        .select("doc_id", F.col("p.0").alias("a"), F.col("p.1").alias("b"))
    bi = pairs.groupBy("a", "b") \
        .agg(F.count("*").cast("double").alias("n_ab"))
    ctx = bi.groupBy("a").agg(
        F.sum("n_ab").alias("c_a"),
        F.count("*").cast("double").alias("fwd_types"))
    cont = bi.groupBy("b").agg(
        F.count("*").cast("double").alias("rev_types"))
    total_types = bi.count()
    scored = (pairs.join(bi, ["a", "b"])
              .join(F.broadcast(ctx), "a")
              .join(F.broadcast(cont), "b")
              .withColumn("logp", F.log(
                  F.greatest(F.col("n_ab") - discount, F.lit(0.0))
                  / F.col("c_a")
                  + discount * F.col("fwd_types") / F.col("c_a")
                  * (F.col("rev_types") / total_types))))
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        (-F.avg("logp")).alias("xent"))
    return per_doc.select("doc_id", "n_bigrams",
                          F.round("xent", 6).alias("kn_xent_r"),
                          F.round(F.exp("xent"), 4).alias("kn_ppl_r"))


def minhash_band_keys_stateless(docs: DataFrame,
                                perms: int = MINHASH128_PERMS,
                                bands: int = MINHASH_BANDS,
                                k: int = SHINGLE_K,
                                extra_cols: tuple = ()) -> DataFrame:
    """(doc_id, band, key[, extra…]) — the SAME 128-perm 16-band LSH
    keys as minhash_band_keys, computed WITHOUT any shuffle: shingles,
    their (h1, h2) hash pairs and all 128 signature minima are
    higher-order ARRAY expressions evaluated per row. Byte-identical to
    the grouped path (pinned in tests), and being stateless it runs on
    Structured Streaming unchanged — which the streaming near-dup gate
    (streaming/dedup.py) needs, since a stream can't pre-shuffle."""
    ws = words_col()
    n = F.size(ws)
    sh = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, i + j) for j in range(k)]))
    h1 = F.transform(sh, lambda s: F.conv(
        F.substring(F.md5(s), 1, 7), 16, 10).cast("long"))
    h2 = F.transform(sh, lambda s: F.conv(
        F.substring(F.md5(s), 9, 7), 16, 10).cast("long"))
    r = perms // bands
    # materialize the hash-pair array in its OWN projection: without
    # this boundary every one of the 128 signature expressions would
    # re-evaluate the md5 pass over all shingles (measured: ~100x)
    paired = docs.where(n >= k).select(
        "doc_id", *extra_cols,
        F.zip_with(h1, h2, lambda a, b: F.struct(
            a.alias("a"), b.alias("b"))).alias("pairs"))
    pairs = F.col("pairs")

    def _perm(j):
        # NB: must be a UNARY lambda — pyspark treats a second lambda
        # parameter as the array index, silently shadowing a j=j default
        return lambda p: (p.a + j * p.b) % MH_PRIME

    band_structs = []
    for b in range(bands):
        sigs = [F.array_min(F.transform(pairs, _perm(j))).cast("string")
                for j in range(b * r, (b + 1) * r)]
        band_structs.append(F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *sigs)).alias("key")))
    out = paired.select(
        "doc_id", *extra_cols,
        F.explode(F.array(*band_structs)).alias("bk"))
    return out.select("doc_id", *extra_cols,
                      F.col("bk.band").alias("band"),
                      F.col("bk.key").alias("key"))


def stratified_sample(docs: DataFrame, rates: dict,
                      strat_col: str = "source",
                      key_col: str = "doc_id",
                      default_rate: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling — the domain-mixture weighting
    step of training-set assembly (different keep rates per source/
    domain/language): keep a row iff md5(key) mod 1e6 < rate[stratum]*1e6.
    Rates ride a broadcast literal map; reproducible across engines and
    cluster sizes like hash_sample; map-only."""
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8),
               16, 10).cast("long") % 1000000
    thr = F.lit(int(default_rate * 1000000))
    for k, v in sorted(rates.items()):
        thr = F.when(F.col(strat_col) == k,
                     F.lit(int(v * 1000000))).otherwise(thr)
    return docs.where(h < thr)


# ---------------------------------------------------------------------------
# exact n-gram contamination + BPE merge statistics
# ---------------------------------------------------------------------------

def ngram_contamination(train: DataFrame, test: DataFrame,
                        k: int = 8) -> DataFrame:
    """Per eval doc: distinct-k-gram overlap against the training corpus
    — the exact decontamination diagnostic (the sharp counterpart of the
    broadcast bloom probe in bloom_contaminated). -> (doc_id, n_grams,
    n_hit, frac_r).

    Scale shape: train grams dedupe corpus-wide (one shuffle with
    map-side partial agg); the eval set is tiny by construction, so the
    semi-join broadcasts the EVAL side against the big gram table and
    stays a map-only probe of the train scan."""
    tg = shingles(train, k).select("sh")
    eg = shingles(test, k).select("doc_id", "sh").distinct()
    hit = (tg.join(F.broadcast(eg), "sh", "inner")
           .select("doc_id", "sh").distinct()
           .groupBy("doc_id").agg(F.count("*").cast("long")
                                  .alias("n_hit")))
    tot = eg.groupBy("doc_id").agg(F.count("*").cast("long")
                                   .alias("n_grams"))
    return (tot.join(hit, "doc_id", "left")
            .select("doc_id", "n_grams",
                    F.coalesce("n_hit", F.lit(0)).cast("long")
                    .alias("n_hit"))
            .withColumn("frac_r",
                        F.round(F.col("n_hit") / F.col("n_grams"), 6)))


def _word_counts(docs: DataFrame) -> DataFrame:
    return (docs.select(F.explode(words_col()).alias("w"))
            .where(F.length("w") > 0)
            .groupBy("w").agg(F.count("*").cast("long").alias("cnt")))


def bpe_pair_counts(docs: DataFrame, top: int = 20) -> DataFrame:
    """Round-1 BPE statistics (Sennrich et al.; the merge-candidate table
    of any BPE trainer): adjacent CHARACTER pair counts over the corpus,
    weighted by word frequency. Deterministic order (cnt DESC, pair ASC)
    -> top rows. Word counting is the only big shuffle; the pair explode
    runs over the distinct-word table (vocabulary-sized)."""
    wc = _word_counts(docs)
    i = F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i")
    pairs = (wc.where(F.length("w") >= 2).select("w", "cnt", i)
             .select(F.expr("substring(w, i, 2)").alias("pair"), "cnt"))
    agg = pairs.groupBy("pair").agg(F.sum("cnt").cast("long")
                                    .alias("cnt"))
    return (agg.orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(top))


def bpe_top_merge_recount(docs: DataFrame, top: int = 10) -> DataFrame:
    """One BPE training round, end-to-end: pick the most frequent
    character pair (ties broken lexicographically), merge it in every
    word's symbol sequence (left-to-right non-overlapping, the
    str.replace semantics BPE uses), and recount adjacent SYMBOL pairs.
    -> top (pair, cnt) after the merge, pair spelled 'sym+sym'.

    The merged pair is a scalar (one driver-side value), so the apply
    stage stays a map-only regexp over the distinct-word table."""
    wc = _word_counts(docs).where(F.length("w") >= 2)
    i = F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i")
    pairs = (wc.select("w", "cnt", i)
             .select(F.expr("substring(w, i, 2)").alias("pair"), "cnt")
             .groupBy("pair").agg(F.sum("cnt").cast("long").alias("cnt")))
    best = pairs.orderBy(F.col("cnt").desc(),
                         F.col("pair").asc()).limit(1).collect()[0].pair
    x, y = best[0], best[1]
    spaced = F.trim(F.regexp_replace("w", "(.)", "$1 "))
    merged = F.replace(spaced, F.lit(f"{x} {y}"), F.lit(x + y))
    syms = F.split(merged, " ")
    base = wc.select("cnt", syms.alias("s")).where(F.size("s") >= 2)
    s = (base.select("cnt", "s",
                     F.explode(F.sequence(F.lit(1), F.size("s") - 1))
                     .alias("j"))
         .select(F.concat(F.element_at("s", F.col("j")), F.lit("+"),
                          F.element_at("s", F.col("j") + 1))
                 .alias("pair"), "cnt"))
    agg = s.groupBy("pair").agg(F.sum("cnt").cast("long").alias("cnt"))
    return (agg.orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(top))


# ---------------------------------------------------------------------------
# sequence packing + tf-idf (training-set assembly)
# ---------------------------------------------------------------------------

def pack_sequences(docs: DataFrame, ctx: int = 512,
                   block: int = 1024) -> DataFrame:
    """GPT-style concat-and-chunk packing placement: documents are laid
    end-to-end in doc_id order (each followed by one EOS token) and the
    stream is cut into fixed ctx-token training sequences. -> one row per
    doc: (doc_id, n_tokens, tok_start, seq_first, seq_last).

    Scale shape: a global running sum normally serializes on one window
    task; here it is the classic two-phase scan — per-block partial sums
    (one tiny row per `block` docs; groupBy with map-side combine), an
    exclusive prefix over the block table (one-partition window over
    ~N/block rows), broadcast back, then a block-local window. Nothing
    bigger than the block table ever leaves the executors, and no stage
    sorts more than `block` rows per key. Choose block ~ sqrt(N) so both
    the prefix window and each block window stay ~sqrt(N) rows (1e6 at
    1e12 docs); the default suits test scale."""
    from pyspark.sql import Window

    d = docs.select(
        "doc_id",
        (F.size(F.split("text", " ")) + F.lit(1)).cast("long").alias("w"))
    d = d.withColumn("blk", (F.col("doc_id") / block).cast("long"))
    sums = d.groupBy("blk").agg(F.sum("w").alias("s"))
    pre = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    offs = sums.select("blk", F.coalesce(F.sum("s").over(pre),
                                         F.lit(0)).alias("base"))
    win = Window.partitionBy("blk").orderBy("doc_id")
    d = (d.join(F.broadcast(offs), "blk")
         .withColumn("tok_start",
                     (F.col("base") + F.sum("w").over(win) - F.col("w"))
                     .cast("long")))
    return d.select(
        "doc_id", (F.col("w") - 1).cast("long").alias("n_tokens"),
        "tok_start",
        F.floor(F.col("tok_start") / ctx).cast("long").alias("seq_first"),
        F.floor((F.col("tok_start") + F.col("w") - 1) / ctx).cast("long")
        .alias("seq_last"))


def pack_sequence_stats(docs: DataFrame, ctx: int = 512,
                        block: int = 1024) -> DataFrame:
    """Per training sequence: how many documents contribute and how many
    of its ctx slots the span boundaries cover. -> (seq_id, n_docs,
    tok_lo, tok_hi). The explode is bounded: a doc spans
    ceil((n_tokens+1)/ctx)+1 sequences, so fan-out is ~stream/ctx."""
    p = pack_sequences(docs, ctx, block)
    seq = F.explode(F.sequence("seq_first", "seq_last")).alias("seq_id")
    e = p.select("doc_id", "n_tokens", "tok_start", seq)
    lo = F.greatest(F.col("tok_start"), F.col("seq_id") * ctx)
    hi = F.least(F.col("tok_start") + F.col("n_tokens") + 1,
                 (F.col("seq_id") + 1) * ctx)
    return (e.select("seq_id", lo.alias("lo"), hi.alias("hi"))
            .groupBy("seq_id")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.min("lo").cast("long").alias("tok_lo"),
                 F.max("hi").cast("long").alias("tok_hi")))


def tfidf_topk(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-k TF-IDF terms (smooth idf = ln((N+1)/(df+1))+1,
    ties broken by term ascending). -> (doc_id, term, tf, df_cnt,
    tfidf_r). Scale shape: tf is one corpus-wide groupBy with map-side
    combine; df is a vocabulary-sized aggregate of the tf table (no
    second pass over the corpus); the join keys on term against the
    vocabulary table and the final top-k is a bounded window."""
    from pyspark.sql import Window

    tf = (docs.select("doc_id", F.explode(words_col()).alias("term"))
          .where(F.length("term") > 0)
          .groupBy("doc_id", "term")
          .agg(F.count("*").cast("long").alias("tf")))
    # materialize the doc-term table once: df derives from it and joins
    # back against it — without the persist the corpus would scan twice
    tf = tf.persist()
    df_t = tf.groupBy("term").agg(F.count("*").cast("long")
                                  .alias("df_cnt"))
    n_docs = docs.select(F.countDistinct("doc_id")).collect()[0][0]
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df_cnt") + 1)) + 1.0
    scored = (tf.join(df_t, "term")
              .withColumn("tfidf", F.col("tf") * idf))
    win = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc())
    return (scored.withColumn("rk", F.row_number().over(win))
            .where(F.col("rk") <= k)
            .select("doc_id", "term", "tf", "df_cnt",
                    F.round("tfidf", 6).alias("tfidf_r")))


def ccnet_buckets(docs: DataFrame) -> DataFrame:
    """CCNet head/middle/tail split (Wenzek et al. 2020 §4.3): per
    language, documents are bucketed by LM perplexity terciles — the
    cheapest-to-train third is 'head'. Thresholds are the ppl of the
    rank-ceil(n/3) and rank-ceil(2n/3) documents (ties broken by
    doc_id), computed once per language (a 3-row-per-language table)
    and broadcast back, so the bucket assignment itself is map-only.
    -> (doc_id, lang, ppl_r, bucket).

    Scale note: the threshold pass ranks within language partitions
    (CCNet computes the same cut from a per-shard histogram); at web
    scale substitute sampled thresholds — the bucketing join is already
    the broadcast/map-only shape that matters."""
    from pyspark.sql import Window

    sc = bigram_lm_scores(docs)
    d = docs.select("doc_id", "lang").join(sc, "doc_id") \
        .select("doc_id", "lang", "ppl_r")
    win = Window.partitionBy("lang").orderBy("ppl_r", "doc_id")
    ranked = d.withColumn("rk", F.row_number().over(win))
    n = d.groupBy("lang").agg(F.count("*").alias("n"))
    th = (ranked.join(n, "lang")
          .where((F.col("rk") == F.ceil(F.col("n") / 3))
                 | (F.col("rk") == F.ceil(2 * F.col("n") / 3)))
          .groupBy("lang")
          .agg(F.min("ppl_r").alias("t1"), F.max("ppl_r").alias("t2")))
    bucket = (F.when(F.col("ppl_r") <= F.col("t1"), F.lit("head"))
              .when(F.col("ppl_r") <= F.col("t2"), F.lit("middle"))
              .otherwise(F.lit("tail")))
    return (d.join(F.broadcast(th), "lang")
            .select("doc_id", "lang", "ppl_r", bucket.alias("bucket")))


def _bpe_merge_round_arrays(v: DataFrame, x: str, y: str) -> DataFrame:
    """Apply ONE learned merge (x, y) to every word's symbol array with
    BPE's greedy left-to-right non-overlapping semantics, as pure
    relational ops: the recurrence applied[i] = match[i] AND NOT
    applied[i-1] collapses to 'position inside a consecutive-match run
    is even' (gaps-and-islands), so one pos-explode + three windows +
    one ordered re-collect replaces the sequential scan. All windows
    partition by word — the vocabulary table, never the corpus."""
    from pyspark.sql import Window

    e = v.select("w", "cnt",
                 F.posexplode("s").alias("i", "sym"))
    win = Window.partitionBy("w").orderBy("i")
    e = e.withColumn("nxt", F.lead("sym").over(win))
    e = e.withColumn("m", (F.col("sym") == x) & (F.col("nxt") == y))
    mrun = F.sum(F.col("m").cast("int")).over(
        win.rowsBetween(Window.unboundedPreceding, 0))
    e = e.withColumn("isl", F.col("i") - mrun)
    rs = F.min("i").over(Window.partitionBy("w", "isl", "m"))
    e = e.withColumn("applied",
                     F.col("m") & (((F.col("i") - rs) % 2) == 0))
    e = e.withColumn("consumed",
                     F.coalesce(F.lag("applied").over(win),
                                F.lit(False)))
    out = (e.where(~F.col("consumed"))
           .select("w", "cnt", "i",
                   F.when(F.col("applied"),
                          F.concat("sym", "nxt")).otherwise(F.col("sym"))
                   .alias("sym")))
    return (out.groupBy("w").agg(
        F.first("cnt").alias("cnt"),
        F.transform(F.array_sort(F.collect_list(F.struct("i", "sym"))),
                    lambda t: t["sym"]).alias("s")))


def bpe_train(docs: DataFrame, n_merges: int = 3):
    """Train n_merges greedy BPE rounds on the corpus (Sennrich et al.
    2016, full multi-character merges): -> (vocab DataFrame
    (w, cnt, s final symbol array), [merge pairs]). Each round is one
    vocabulary-sized aggregation + one scalar collect (the winning
    pair); the corpus itself is scanned exactly once, for word counts."""
    chars = F.expr("transform(sequence(1, length(w)), "
                   "i -> substring(w, i, 1))")
    v = _word_counts(docs).select("w", "cnt", chars.alias("s"))
    merges = []
    for _ in range(n_merges):
        v = v.persist()
        pairs = (v.select("cnt", F.posexplode("s").alias("i", "x"),
                          F.col("s").alias("s_"))
                 .where(F.col("i") < F.size("s_") - 1)
                 .select("cnt", "x",
                         F.element_at("s_", F.col("i") + 2).alias("y"))
                 .groupBy("x", "y")
                 .agg(F.sum("cnt").alias("n")))
        top = pairs.orderBy(F.col("n").desc(), F.col("x").asc(),
                            F.col("y").asc()).limit(1).collect()
        if not top:
            break
        x, y = top[0].x, top[0].y
        merges.append((x, y))
        v = _bpe_merge_round_arrays(v, x, y)
    return v, merges


def bpe_token_counts(docs: DataFrame, n_merges: int = 3) -> DataFrame:
    """Per doc: whitespace tokens, characters, and BPE tokens after
    n_merges trained merge rounds. The doc->vocab join is an equi-join
    on the word (broadcastable when the vocabulary fits)."""
    v, _merges = bpe_train(docs, n_merges)
    sizes = v.select("w", F.size("s").cast("long").alias("n_sym"))
    d = (docs.select("doc_id", F.explode(words_col()).alias("w"))
         .where(F.length("w") > 0)
         .join(sizes, "w"))
    base = docs.select(
        "doc_id",
        F.size(F.filter(words_col(), lambda t: F.length(t) > 0))
        .cast("long").alias("n_ws"))
    agg = d.groupBy("doc_id").agg(F.sum("n_sym").cast("long")
                                  .alias("n_bpe"))
    return (base.join(agg, "doc_id", "left")
            .select("doc_id", "n_ws",
                    F.coalesce("n_bpe", F.lit(0)).cast("long")
                    .alias("n_bpe")))


def bm25_topk(docs: DataFrame, terms=("spark", "hash", "merge"),
              k1: float = 1.2, b: float = 0.75, k: int = 20) -> DataFrame:
    """Okapi BM25 ranking of the corpus against a fixed term set
    (Robertson & Zaragoza 2009): idf = ln(1 + (N - df + .5)/(df + .5)),
    score = sum_t idf_t * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    -> (doc_id, rank, score_r), top-k by (score desc, doc_id asc).

    Scale shape: ONE corpus scan builds the per-doc term-count table
    (persisted, vocabulary x docs shaped after map-side combine);
    doc length, query-term tf, and df all derive from it — no second
    pass over the corpus. df joins back broadcast; N and avgdl are
    one-row aggregates. The final top-k is TakeOrderedAndProject."""
    from pyspark.sql import Window

    cnts = (docs.select("doc_id", F.explode(words_col()).alias("term"))
            .where(F.length("term") > 0)
            .groupBy("doc_id", "term")
            .agg(F.count("*").cast("long").alias("c")))
    cnts = cnts.persist()
    dl = cnts.groupBy("doc_id").agg(F.sum("c").cast("long").alias("dl"))
    n_docs = docs.count()
    avgdl = (dl.agg(F.sum("dl")).collect()[0][0] or 0) / float(n_docs)
    tf = (cnts.where(F.col("term").isin(*terms))
          .select("doc_id", "term", F.col("c").alias("tf")))
    df_t = tf.groupBy("term").agg(F.count("*").cast("long")
                                  .alias("df_cnt"))
    idf = F.log(1.0 + (F.lit(float(n_docs)) - F.col("df_cnt") + 0.5)
                / (F.col("df_cnt") + 0.5))
    denom = (F.col("tf") + k1 * (1.0 - b + b * F.col("dl")
                                 / F.lit(float(avgdl))))
    part = idf * (F.col("tf") * (k1 + 1.0)) / denom
    scored = (tf.join(F.broadcast(df_t), "term").join(dl, "doc_id")
              .groupBy("doc_id").agg(F.sum(part).alias("score")))
    # distributed top-k (TakeOrderedAndProject: per-partition partial
    # top-k, never a single-partition window over the corpus); the rank
    # window then runs over only k rows
    top = scored.orderBy(F.col("score").desc(),
                         F.col("doc_id").asc()).limit(k)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (top.withColumn("rank", F.row_number().over(win))
            .select("doc_id", F.col("rank").cast("int").alias("rank"),
                    F.round("score", 6).alias("score_r")))


def dsir_weights(docs: DataFrame, target_lang: str = "de") -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169) with
    unigram features: log w(d) = sum_tok [ln p_target(tok) - ln p_raw(tok)]
    where both distributions are add-0.5-smoothed over the raw vocabulary
    (p(w) = (c_w + .5)/(T + .5*|V|)). The target slice here is one
    language of the corpus; at production scale it is the high-quality
    reference corpus. -> (doc_id, logw_r).

    Scale shape: ONE corpus scan builds the doc-term count table; the
    raw and target unigram tables both aggregate from it (no second
    scan); the per-term log-ratio table is vocabulary-sized and joins
    back broadcast, so the final per-doc weight is a map-side-combined
    groupBy."""
    tf = (docs.select("doc_id", "lang",
                      F.explode(words_col()).alias("term"))
          .where(F.length("term") > 0)
          .groupBy("doc_id", "lang", "term")
          .agg(F.count("*").cast("long").alias("c")))
    tf = tf.persist()
    raw = tf.groupBy("term").agg(F.sum("c").alias("cr"))
    tgt = (tf.where(F.col("lang") == target_lang)
           .groupBy("term").agg(F.sum("c").alias("ct")))
    r_tot, v_size = raw.agg(F.sum("cr"), F.count("*")).collect()[0]
    t_tot = tgt.agg(F.sum("ct")).collect()[0][0] or 0
    lograt = (raw.join(tgt, "term", "left")
              .select("term",
                      (F.log((F.coalesce(F.col("ct"), F.lit(0)) + 0.5)
                             / F.lit(float(t_tot) + 0.5 * v_size))
                       - F.log((F.col("cr") + 0.5)
                               / F.lit(float(r_tot) + 0.5 * v_size))
                       ).alias("lr")))
    return (tf.join(F.broadcast(lograt), "term")
            .groupBy("doc_id")
            .agg(F.round(F.sum(F.col("c") * F.col("lr")), 6)
                 .alias("logw_r")))


def hashed_ngram_scores(docs: DataFrame, pos_lang: str = "en",
                        bits: int = 16) -> DataFrame:
    """fastText-style hashing-trick classifier scores (Joulin et al.
    2016, arXiv:1607.01759) with naive-Bayes log-count-ratio weights
    (Wang & Manning 2012, NBSVM): unigram + bigram features hash into
    2^bits buckets via md5, each bucket's weight is the smoothed
    log-ratio of class-conditional frequencies, and a document scores
    bias + sum_f c_f * w_f with pred = score > 0 — the cheap quality /
    domain classifier used by CCNet- and GPT-3-style curation filters.
    -> (doc_id, score_r, pred).

    Why hashing survives scale: the weight table is FIXED at 2^bits
    rows regardless of corpus size, so it broadcasts at 100 TB exactly
    as at 1 GB (a raw-vocabulary weight table grows with the corpus and
    eventually can't). One corpus scan builds the per-doc bucket-count
    table; class totals, bucket weights and doc scores all derive from
    it — counts are map-side-combined groupBys, scoring is a broadcast
    join."""
    import math

    B = 1 << bits
    ws = words_col()
    n = F.size(ws)
    uni = docs.select("doc_id", "lang", F.explode(ws).alias("g"))
    big = docs.select(
        "doc_id", "lang",
        F.explode(F.arrays_zip(F.slice(ws, 1, n - 1),
                               F.slice(ws, 2, n - 1))).alias("p")) \
        .select("doc_id", "lang",
                F.concat_ws(" ", "p.0", "p.1").alias("g"))
    feats = uni.unionByName(big).select(
        "doc_id", "lang",
        (F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long")
         % B).alias("f"))
    cnt = (feats.groupBy("doc_id", "lang", "f")
           .agg(F.count("*").cast("long").alias("c")))
    cnt = cnt.persist()
    pos = F.col("lang") == pos_lang
    agg = cnt.groupBy("f").agg(
        F.sum(F.when(pos, F.col("c")).otherwise(0)).alias("cp"),
        F.sum(F.when(~pos, F.col("c")).otherwise(0)).alias("cn"))
    tp, tn = [float(x or 0) for x in
              agg.agg(F.sum("cp"), F.sum("cn")).collect()[0]]
    n_pos = docs.where(pos).count()
    n_neg = docs.count() - n_pos
    # +0.5-smoothed prior: defined even when one class is absent (e.g.
    # a heavily filtered slice), matching the feature smoothing
    bias = math.log((n_pos + 0.5) / (n_neg + 0.5))
    w = agg.select("f", (F.log((F.col("cp") + 0.5)
                               / F.lit(tp + 0.5 * B))
                         - F.log((F.col("cn") + 0.5)
                                 / F.lit(tn + 0.5 * B))).alias("w"))
    return (cnt.join(F.broadcast(w), "f")
            .groupBy("doc_id")
            .agg((F.lit(bias) + F.sum(F.col("c") * F.col("w")))
                 .alias("score"))
            .select("doc_id", F.round("score", 6).alias("score_r"),
                    (F.col("score") > 0).cast("int").alias("pred")))


def substring_dedup(docs: DataFrame, k: int = 40,
                    min_count: int = 2) -> DataFrame:
    """Exact duplicated-substring spans, char-level (the fixed-k
    relational form of Lee et al. 2021, arXiv:2107.06499 'Deduplicating
    Training Data Makes Language Models Better': their suffix array
    finds maximal repeats >= k; marking every duplicated k-gram start
    and merging overlaps yields the same byte spans): a char k-gram
    occurring >= min_count times corpus-wide marks positions, and per
    doc the marked [i, i+k) intervals merge into maximal spans.
    -> (doc_id, span_lo, span_hi, span_len), 1-based inclusive.

    Scale shape: the position explode is length-bounded per doc; the
    only corpus-wide shuffle is the k-gram groupBy (at production scale
    hash each gram to a 64-bit key first to shrink shuffle bytes — the
    string key here keeps the oracle byte-exact); the interval merge is
    a per-doc window over only the DUPLICATED positions (gaps-and-
    islands: break where i > running-max(end) + 1)."""
    from pyspark.sql import Window

    n = F.length("text")
    pos = docs.select(
        "doc_id", "text",
        F.explode(F.when(n >= k, F.sequence(F.lit(1), n - (k - 1)))
                  .otherwise(F.array().cast("array<int>"))).alias("i"))
    grams = pos.select(
        "doc_id", "i",
        F.col("text").substr(F.col("i"), F.lit(k)).alias("g"))
    grams = grams.persist()
    dup = (grams.groupBy("g").agg(F.count("*").alias("c"))
           .where(F.col("c") >= min_count).select("g"))
    hits = grams.join(dup, "g").select("doc_id", "i")
    w = Window.partitionBy("doc_id").orderBy("i")
    prev_end = F.max(F.col("i") + (k - 1)) \
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(F.col("i") > F.coalesce(prev_end, F.lit(-k)) + 1, 1) \
        .otherwise(0)
    isl = hits.withColumn("brk", brk).withColumn(
        "island", F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (isl.groupBy("doc_id", "island")
            .agg(F.min("i").cast("long").alias("span_lo"),
                 (F.max("i") + (k - 1)).cast("long").alias("span_hi"))
            .select("doc_id", "span_lo", "span_hi",
                    (F.col("span_hi") - F.col("span_lo") + 1)
                    .alias("span_len")))


def training_shuffle(docs: DataFrame, n_shards: int = 4,
                     seed: str = "s0") -> DataFrame:
    """Deterministic global training-order shuffle: every document gets
    a (shard, pos) placement from the md5 of (seed, doc_id) — the
    'shuffle the corpus before training' step, reproducible across
    engines and cluster sizes (no partitioning-dependent randomness).
    shard = hash % n_shards; pos = rank of hash within the shard.
    -> (doc_id, shard, pos).

    Scale shape: the hash is map-only column math; the only shuffle is
    the per-shard rank window, which partitions BY SHARD — each shard
    sorts independently (corpus_size/n_shards rows), so n_shards scales
    with the corpus and no global sort ever happens."""
    from pyspark.sql import Window

    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(seed), F.lit(":"),
                       F.col("doc_id").cast("string"))), 1, 12),
        16, 10).cast("long")
    d = docs.select("doc_id", h.alias("h"),
                    (h % n_shards).cast("int").alias("shard"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (d.withColumn("pos", F.row_number().over(w).cast("long"))
            .select("doc_id", "shard", "pos"))


def temperature_sample(docs: DataFrame, tau: float = 2.0,
                       base_rate: float = 0.5) -> DataFrame:
    """Temperature-based source mixture sampling (the multilingual
    rebalancing rule of mT5/XLM-R, arXiv:1910.10683 §3.4.2 applied to
    sources): sampling weight per source s is share_s^(1/tau)
    renormalized; a source's per-doc keep rate is
    base_rate * weight_s / share_s (capped at 1), applied with the
    deterministic md5 threshold of hash_sample. tau>1 upsamples the
    tail, tau=1 keeps natural proportions. -> sampled (doc_id, source).

    Scale shape: the share table is #sources rows (one groupBy), rates
    compute driver-side on that tiny table and broadcast back; the keep
    decision is map-only hash math."""
    n = docs.count()
    shares = [(r["source"], r["c"] / n) for r in
              docs.groupBy("source").agg(F.count("*").alias("c"))
              .collect()]
    z = sum(s ** (1.0 / tau) for _, s in shares)
    rates = [(src, min(1.0, base_rate * ((s ** (1.0 / tau)) / z) / s))
             for src, s in shares]
    rt = docs.sparkSession.createDataFrame(rates, "source string,"
                                           " rate double")
    h = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                            1, 6), 16, 10).cast("long") % 1000000) \
        / 1000000.0
    return (docs.join(F.broadcast(rt), "source")
            .where(h < F.col("rate"))
            .select("doc_id", "source"))


def doremi_weights(docs: DataFrame, eta: float = 0.5,
                   rounds: int = 3) -> DataFrame:
    """-> (source, loss, weight): DoReMi-style domain mixture weights
    (Xie et al. 2023 "DoReMi: Optimizing Data Mixtures") in the cheap
    proxy form: per-domain excess loss drives a multiplicative-weights
    update  alpha' ∝ alpha * exp(eta * (loss_d - <alpha, loss>)),
    renormalized each round. The per-doc loss proxy is the
    length-normalized surprisal stand-in ln(1 + chars/tokens) (a real
    run plugs in reference-model log-loss; the UPDATE is the operator).

    Determinism contract: the per-doc loss rounds to 9 decimals and
    sums as DECIMAL (exact, association-free); every per-round
    intermediate rounds to 12 decimals before its exact decimal sum, so
    the oracle replays bit-for-bit. One corpus-wide aggregation total;
    the iteration runs on the domain-sized table (broadcast-tiny, the
    whole-table window below is over #domains rows, not docs)."""
    from pyspark.sql import Window

    whole = Window.partitionBy()
    per_doc = docs.select(
        "source",
        F.round(F.log(1.0 + F.col("n_chars").cast("double")
                      / F.size(words_col())), 9).alias("l"))
    dom = per_doc.groupBy("source").agg(
        (F.sum(F.col("l").cast("decimal(28,9)")).cast("double")
         / F.count("*")).alias("loss"))
    dom = dom.withColumn(
        "weight", F.round(1.0 / F.count("*").over(whole), 12))
    for _ in range(rounds):
        mean_l = (F.sum(F.round(F.col("weight") * F.col("loss"), 12)
                        .cast("decimal(28,12)")).over(whole)
                  .cast("double"))
        dom = dom.withColumn(
            "u", F.round(F.col("weight")
                         * F.exp(eta * (F.col("loss") - mean_l)), 12))
        s = F.sum(F.col("u").cast("decimal(28,12)")).over(whole)             .cast("double")
        dom = dom.withColumn("weight", F.round(F.col("u") / s, 12))             .drop("u")
    return dom.select("source", F.round("loss", 9).alias("loss"),
                      "weight")


def weighted_sample_topk(docs: DataFrame, k: int = 5,
                         group_col: str = "lang",
                         weight_col: str = "n_chars") -> DataFrame:
    """-> (group, doc_id, key_r): deterministic weighted reservoir
    sampling WITHOUT replacement, k per group (Efraimidis & Spirakis
    2006 A-Res: each item draws u ~ U(0,1), its key is u^(1/w); the
    top-k keys ARE a weighted sample). The uniform comes from md5 so
    any engine replays it bit-for-bit; one bounded per-group window —
    at corpus scale this is the one-pass distributed weighted sampler
    (no rejection loop, no global sort).
    """
    from pyspark.sql import Window

    u = ((F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                 16, 10).cast("double") + 1.0) / 4294967297.0)
    key = F.pow(u, 1.0 / F.col(weight_col).cast("double"))
    return (docs.select(F.col(group_col).alias("grp"), "doc_id",
                        key.alias("key"))
            .withColumn("rk", F.row_number().over(
                Window.partitionBy("grp").orderBy(F.desc("key"),
                                                  F.asc("doc_id"))))
            .where(F.col("rk") <= k)
            .select("grp", "doc_id", F.round("key", 12).alias("key_r"),
                    "rk"))


def pmi_cooccurrence(docs: DataFrame, window: int = 2,
                     min_pairs: int = 5, top: int = 200) -> DataFrame:
    """-> (w1, w2, n_pair, pmi_r): pointwise mutual information of
    token pairs co-occurring within ``window`` positions (Church &
    Hanks 1990) — the classic corpus-association statistic
    (collocations, phrase mining, embedding evaluation).

    Relational shape: tokens posexplode once; the pair table is a
    self-equi-join on doc_id restricted to 1 <= j-i <= window (bounded
    fan-out: window * corpus tokens, NOT quadratic); unigram and pair
    counts are map-side-combined groupBys; PMI joins the two tiny
    vocab-sized count tables back. Ordered pairs (w1 before w2) keep
    the statistic direction-aware. Top-N by (n_pair, pmi) bounds the
    result for inspection."""
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.posexplode(words_col()).alias("i", "w"))
    total = toks.count()
    uni = toks.groupBy("w").agg(F.count("*").alias("nw"))
    a = toks.select("doc_id", F.col("i").alias("i1"),
                    F.col("w").alias("w1"))
    b = toks.select("doc_id", F.col("i").alias("i2"),
                    F.col("w").alias("w2"))
    pairs = (a.join(b, "doc_id")
             .where((F.col("i2") - F.col("i1") >= 1)
                    & (F.col("i2") - F.col("i1") <= window))
             .groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
             .where(F.col("n_pair") >= min_pairs))
    tot_pairs = F.lit(float(total))          # normalizer: token count
    scored = (pairs
              .join(uni.select(F.col("w").alias("w1"),
                               F.col("nw").alias("n1")), "w1")
              .join(uni.select(F.col("w").alias("w2"),
                               F.col("nw").alias("n2")), "w2")
              .select("w1", "w2", "n_pair",
                      F.round(F.log(
                          (F.col("n_pair").cast("double") * tot_pairs)
                          / (F.col("n1").cast("double")
                             * F.col("n2").cast("double"))), 9)
                      .alias("pmi_r")))
    wnd = Window.orderBy(F.desc("n_pair"), F.asc("w1"), F.asc("w2"))
    return (scored.withColumn("rnk", F.row_number().over(wnd))
            .where(F.col("rnk") <= top).drop("rnk"))


def unigram_viterbi(docs: DataFrame, max_word_len: int = 10,
                    max_piece: int = 4) -> DataFrame:
    """-> (word, n_docs, best_score, pieces): unigram-LM subword
    segmentation (the SentencePiece / Kudo 2018 inference step) of every
    distinct corpus word, by Viterbi DP over all substrings of length
    1..max_piece. Piece scores are the closed-form

        score(p) = 10 * len(p)^2 + md5_prefix(p) % 7

    (longer pieces win, with a deterministic per-piece jitter standing in
    for a trained log-probability table); ties between equal-score
    segmentations break on the lexicographically smallest 'a|bc' path
    string — a prefix-monotone rule, so the DP stays exact.

    Scale shape: SentencePiece's own trick — segment the DISTINCT word
    vocabulary (groupBy word, a map-side-combined shuffle), never the
    corpus stream; per-word DP is O(len * max_piece) inside one Arrow
    batch. The oracle takes the opposite route and ENUMERATES every
    segmentation of every word with a recursive CTE, then argmaxes —
    two independent formulations meeting on the same table."""
    import hashlib

    words = (docs.select(F.explode(F.split(F.lower("text"),
                                           "[^a-z]+")).alias("word"),
                         F.col("doc_id"))
             .where((F.length("word") >= 1)
                    & (F.length("word") <= max_word_len))
             .groupBy("word")
             .agg(F.countDistinct("doc_id").alias("n_docs")))

    def seg(batch):
        scores, paths = [], []
        for w in batch:
            n = len(w)
            best = [(0, "")] + [None] * n        # (score, path)
            for i in range(1, n + 1):
                cand = None
                for k in range(1, min(max_piece, i) + 1):
                    piece = w[i - k:i]
                    sc = 10 * k * k + int(hashlib.md5(
                        piece.encode()).hexdigest()[:2], 16) % 7
                    prev = best[i - k]
                    path = (prev[1] + "|" + piece) if prev[1] else piece
                    c = (prev[0] + sc, path)
                    if cand is None or c[0] > cand[0] \
                            or (c[0] == cand[0] and c[1] < cand[1]):
                        cand = c
                best[i] = cand
            scores.append(best[n][0])
            paths.append(best[n][1])
        return pd.Series([f"{sc}:{p}"
                          for sc, p in zip(scores, paths)])

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def f(batch: pd.Series) -> pd.Series:
        return seg(batch)
    out = words.withColumn("_r", f("word"))
    return out.select(
        "word", "n_docs",
        F.split("_r", ":").getItem(0).cast("long").alias("best_score"),
        F.split("_r", ":").getItem(1).alias("pieces"))


def cdc_chunks(docs: DataFrame, mask_bits: int = 6) -> DataFrame:
    """-> (doc_id, chunk_idx, start, length, chunk_hash): content-defined
    chunking by a 32-char cyclic-polynomial (buzhash) rolling hash — the
    LBFS/rsync family primitive (Muthitacharoen et al. 2001) that makes
    byte-level dedup robust to insertions: a chunk boundary falls after
    position i when

        H_i = XOR_{j=0..31} ROTL32(gear(c_{i-j}), j)

    has its low ``mask_bits`` bits zero. gear(c) is a closed-form md5
    constant per character, so boundaries depend only on a 32-char
    context window — an insertion shifts chunk starts locally but every
    other chunk HASH survives, which fixed-size blocking cannot do.

    Spark shape: the rotation factors through the anchor —
    ROTL(g, i-j mod 32) = ROTL(ROTR(g, j mod 32), i mod 32) — so each
    char contributes ONE anchor-independent term ROTR32(gear, i mod 32)
    and H is a windowed bit_xor followed by a per-row rotation: char
    explode, window XOR, boundary flag, running chunk id and substring
    re-assembly are ALL whole-stage-codegen JVM column math (no Python
    on the hot path; the same pipeline replays verbatim in the DuckDB
    oracle). The min/max clamps of production FastCDC are deliberately
    omitted: they chain each boundary to the previous ACCEPTED one,
    where the pure gear form stays one stateless window."""
    mask32 = (1 << 32) - 1
    gear = F.pmod(F.conv(F.substring(F.md5(F.col("ch")), 1, 8), 16, 10)
                  .cast("long"), F.lit(1 << 32))
    chars = docs.select(
        "doc_id",
        F.posexplode(F.split("text", "(?!^)")).alias("i", "ch")) \
        .where(F.col("ch") != "")      # split keeps a trailing ''
    # per-row term: ROTR32(gear, i mod 32)
    chars = chars.withColumn("g", gear).withColumn(
        "pre", F.expr(f"""CASE WHEN i % 32 = 0 THEN g ELSE
            (shiftrightunsigned(g, cast(i % 32 as int))
             | shiftleft(g, 32 - cast(i % 32 as int))) & {mask32}
            END"""))
    chars = chars.withColumn(
        "x", F.expr("""bit_xor(pre) OVER (PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN 31 PRECEDING AND CURRENT ROW)"""))
    # H = ROTL32(x, i mod 32)
    h = F.expr(f"""CASE WHEN i % 32 = 0 THEN x ELSE
        (shiftleft(x, cast(i % 32 as int))
         | shiftrightunsigned(x, 32 - cast(i % 32 as int))) & {mask32}
        END""")
    flagged = chars.withColumn("h", h).withColumn(
        "b", ((F.col("h") % (1 << mask_bits)) == 0).cast("int"))
    cid = F.coalesce(F.expr(
        """sum(b) OVER (PARTITION BY doc_id ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"""),
        F.lit(0))
    starts = (flagged.withColumn("cid", cid)
              .groupBy("doc_id", "cid")
              .agg(F.min("i").alias("start"),
                   (F.max("i") - F.min("i") + 1).alias("length")))
    return (starts.join(docs.select("doc_id", "text"), "doc_id")
            .select("doc_id", F.col("cid").cast("long").alias("chunk_idx"),
                    F.col("start").cast("long").alias("start"),
                    F.col("length").cast("long").alias("length"),
                    F.md5(F.expr("substring(text, start + 1, length)"))
                    .alias("chunk_hash")))


def cdc_dedup_stats(docs: DataFrame, mask_bits: int = 6) -> DataFrame:
    """-> (chunk_hash, n_copies, length, saved_bytes) for every chunk
    appearing more than once — corpus-wide groupBy(chunk_hash), the same
    map-side-combined shape as exact dedup."""
    ch = cdc_chunks(docs, mask_bits)
    return (ch.groupBy("chunk_hash")
            .agg(F.count("*").cast("long").alias("n_copies"),
                 F.max("length").alias("length"))
            .where(F.col("n_copies") > 1)
            .select("chunk_hash", "n_copies", "length",
                    ((F.col("n_copies") - 1) * F.col("length"))
                    .cast("long").alias("saved_bytes")))


def platt_scaling(docs: DataFrame, iters: int = 6) -> DataFrame:
    """-> one row (a_r, b_r, loss_r, n): Platt scaling (Platt 1999) — fit
    sigma(a*x + b) to binary labels by Newton/IRLS, the standard
    calibration step after a quality classifier. Here x is each page's
    'e'-frequency and y = 1 when the text mentions 'spark' (a
    deterministic stand-in for classifier score and gold label).

    Determinism across engines: every Newton iteration needs three
    gradient/Hessian sums over the corpus; floating sums are
    order-dependent, so each per-row term is cast to DECIMAL(38,20)
    first — the sums are then EXACT integers in fixed-point and both
    Spark and any SQL replay produce bit-identical iterates. Each
    iteration is one map-side-combined aggregate (6 numbers cross the
    shuffle); the 2x2 Newton solve is closed-form driver math — the
    same shape a 10^12-page calibration runs."""
    base = docs.select(
        ((F.length("text")
          - F.length(F.regexp_replace("text", "e", "")))
         .cast("double") / F.length("text")).alias("x"),
        F.when(F.col("text").contains("spark"), 1.0).otherwise(0.0)
        .alias("y"))
    base = base.persist()
    a, b = 0.0, 0.0
    dec = "decimal(38,20)"
    loss = None
    n = base.count()
    for _ in range(iters):
        z = F.lit(a) * F.col("x") + F.lit(b)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        w = p * (F.lit(1.0) - p)
        row = base.agg(
            F.sum(((p - F.col("y")) * F.col("x")).cast(dec)).alias("g1"),
            F.sum((p - F.col("y")).cast(dec)).alias("g2"),
            F.sum((w * F.col("x") * F.col("x")).cast(dec)).alias("h11"),
            F.sum((w * F.col("x")).cast(dec)).alias("h12"),
            F.sum(w.cast(dec)).alias("h22"),
            F.sum((-(F.col("y") * F.log(p)
                     + (F.lit(1.0) - F.col("y"))
                     * F.log(F.lit(1.0) - p))).cast(dec)).alias("ll"),
        ).collect()[0]
        g1, g2 = float(row.g1), float(row.g2)
        h11, h12, h22 = float(row.h11), float(row.h12), float(row.h22)
        loss = float(row.ll)
        det = h11 * h22 - h12 * h12
        a = a - (h22 * g1 - h12 * g2) / det
        b = b - (h11 * g2 - h12 * g1) / det
    spark = docs.sparkSession
    return spark.createDataFrame(
        [(round(a, 9), round(b, 9), round(loss / n, 9), n)],
        "a_r double, b_r double, loss_r double, n long")


def length_percentiles(docs: DataFrame,
                       qs=(0.5, 0.9, 0.99)) -> DataFrame:
    """-> one row of EXACT token-length percentiles (nearest-rank, the
    SQL PERCENTILE_DISC definition) — the corpus length profile every
    dataset card reports. Exact at any scale: lengths are small ints,
    so one map-side-combined groupBy(length) histogram + a cumulative
    window over the (tiny) distinct-length table replaces a full sort
    of the corpus."""
    from pyspark.sql import Window

    ln = docs.select(F.size(F.split("text", " ")).alias("len"))
    hist = ln.groupBy("len").agg(F.count("*").alias("c"))
    n = ln.count()
    w = Window.orderBy("len").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("c").over(w))
    cols = []
    for q in qs:
        rank = int(np.ceil(q * n))
        v = (cum.where(F.col("cum") >= rank)
             .orderBy("len").limit(1)
             .select("len").collect()[0][0])
        cols.append((f"p{int(q * 100)}", int(v)))
    spark = docs.sparkSession
    return spark.createDataFrame(
        [tuple(v for _, v in cols) + (n,)],
        ", ".join(f"{k} int" for k, _ in cols) + ", n long")


def readability(docs: DataFrame) -> DataFrame:
    """-> (doc_id, n_words, n_sents, n_syll, fk_grade_r, fre_r):
    Flesch-Kincaid grade and Flesch reading ease (Kincaid et al. 1975)
    — the classic readability gate in curation filters. Syllables use
    the standard vowel-group heuristic (maximal [aeiouy]+ runs), and
    sentences count terminal punctuation runs; every count is one
    regexp over the text, so the whole operator is JVM column math."""
    words = F.size(F.split(F.trim("text"), "\\s+"))
    sents = F.greatest(
        F.size(F.split("text", "[.!?]+")) - 1, F.lit(1))
    lower = F.lower("text")
    # each maximal vowel run -> one marker char; digits can't collide
    # because non-letters are stripped first
    marked = F.regexp_replace(
        F.regexp_replace(lower, "[^a-z]+", " "), "[aeiouy]+", "1")
    syll = F.greatest(
        F.length(marked)
        - F.length(F.regexp_replace(marked, "1", "")), F.lit(1))
    fk = (F.lit(0.39) * words / sents
          + F.lit(11.8) * syll / words - F.lit(15.59))
    fre = (F.lit(206.835) - F.lit(1.015) * words / sents
           - F.lit(84.6) * syll / words)
    return docs.select(
        "doc_id", words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sents"),
        syll.cast("long").alias("n_syll"),
        F.round(fk, 6).alias("fk_grade_r"),
        F.round(fre, 6).alias("fre_r"))
