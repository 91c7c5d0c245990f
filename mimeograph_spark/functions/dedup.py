"""Deduplication operators for training-data pipelines.

Exact, shingle-signature, MinHash+LSH, n-gram Jaccard, and SimHash —
all hot paths are pure built-in column expressions (JVM, codegen); no
Python UDFs, so they hold up at 100 TB.  Hashing is md5-based
everywhere because md5 is the one hash Spark and DuckDB share, keeping
every stage oracle-verifiable.

Scale notes:
- exact/shingle dedup: one hash-aggregate shuffle on the fingerprint —
  the minimal possible plan; AQE handles skewed fingerprint groups.
- MinHash LSH (lsh_candidate_pairs): duplicate-heavy corpora are the
  normal case for training data, so the operator first collapses
  exact-fingerprint groups to one canonical representative (emitting
  the member->canonical links linearly, never the O(m^2) pair set of
  an identical-doc cluster), then bands only the representatives.  The
  band self-join carries ids only — shingle arrays are re-joined just
  for the candidate rerank — and buckets larger than `max_bucket` are
  dropped before the join (a real cap, enforced by a window count),
  so no reducer can ever see a quadratic pair blowup.
- SimHash (simhash_near_dups): multi-table blocking — the signature
  splits into n_blocks contiguous blocks and pairs join per block, so
  recall is 100% for hamming <= n_blocks - 1 (pigeonhole) instead of
  the top-bits-only heuristic; blocks are capped like LSH buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..cacheutil import register_cap_stats, register_persisted
from .textstats import fingerprint


def drop_stats(
    sized: DataFrame, keys: list[str], cap: int, operator: str
) -> DataFrame:
    """Cap accounting ("no silent caps"): 1-row frame counting the
    buckets/rows a `> cap` filter discarded.  `sized` must carry the
    per-bucket window count as `_bn`.  Zero-drop corpora yield a row
    of zeros, so the signal is always present, never absent."""
    return (
        sized.filter(F.col("_bn") > cap)
        .agg(
            F.countDistinct(F.concat_ws(":", *keys))
            .cast("long")
            .alias("dropped_buckets"),
            F.count(F.lit(1)).cast("long").alias("dropped_rows"),
        )
        .select(
            F.lit(operator).alias("operator"),
            "dropped_buckets",
            "dropped_rows",
        )
    )

# MinHash parameters: k permutations as (a, b) pairs over a Mersenne
# prime field; fixed constants (seeded once, hard-coded) so Spark and
# the DuckDB oracle agree bit-for-bit.
MINHASH_PRIME = 2147483647  # 2^31 - 1
_A0, _B0 = 1103515245, 12345  # LCG-style parameter generator


def minhash_params(k: int) -> list[tuple[int, int]]:
    params, a, b = [], _A0, _B0
    for _ in range(k):
        a = (a * 1103515245 + 12345) % MINHASH_PRIME
        b = (b * 69069 + 1) % MINHASH_PRIME
        params.append((a | 1, b))
    return params


def norm_tokens(text: Column) -> Column:
    """Normalized word tokens (lowercase, whitespace-collapsed) — the
    shared tokenizer under every shingle-based operator."""
    return F.split(
        F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "), " "
    )


def shingles_from_tokens(
    toks: Column, n: int, pad_short: bool = True
) -> Column:
    """Distinct word n-gram shingles from a pre-tokenized column.
    Multi-n consumers stage the tokens ONCE and call this per n —
    calling shingles(text, n) per n would inline the split/normalize
    chain into every branch (the duplicated-expression disease).
    With pad_short=False a text shorter than n yields NO grams
    instead of one whole-text gram (graded decontamination wants
    longest_n to mean a real n-token window)."""
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    short = (
        F.array(F.array_join(toks, " "))
        if pad_short
        else F.array().cast("array<string>")
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(short)
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of normalized text."""
    return shingles_from_tokens(norm_tokens(text), n)


def shingle_hash(shingle: Column) -> Column:
    """Shingle -> uint32 via the first 8 hex chars of md5 (shared with
    DuckDB; Spark's own hash()/crc32 don't exist there)."""
    return F.conv(F.substring(F.md5(shingle), 1, 8), 16, 10).cast("long")


def minhash_from_hashes(hs: Column, k: int = 16) -> Column:
    """k-element MinHash signature from an already-hashed shingle
    array: array_min over one cheap affine transform per permutation."""
    def permute(a: int, b: int):
        return lambda h: (h * a + b) % MINHASH_PRIME

    sigs = [
        F.array_min(F.transform(hs, permute(a, b)))
        for a, b in minhash_params(k)
    ]
    return F.array(*sigs)


def minhash_signature(text: Column, k: int = 16, n: int = 3) -> Column:
    """k-element MinHash signature of the shingle set.

    NOTE: inlines shingling+md5 into every permutation — use only for
    one-off expressions.  Query paths should project the hashed shingle
    array ONCE and call `minhash_from_hashes` (16x less md5 work; see
    with_minhash / lsh_candidate_pairs)."""
    hs = F.transform(shingles(text, n), shingle_hash)
    return minhash_from_hashes(hs, k)


def with_shingle_hashes(
    df: DataFrame, text_col: str = "text", n: int = 3, out: str = "_hs"
) -> DataFrame:
    """Project the md5-hashed shingle array as a real column so
    downstream MinHash permutations reuse it instead of recomputing
    shingling+md5 per permutation (Catalyst's CollapseProject keeps the
    materialization because duplicating a non-cheap expression 16x is
    against its own cost rule).

    The token array is ALSO staged as its own projection first:
    higher-order functions are interpreted, not codegen'd, so a free
    sub-expression inside the per-gram lambda (`slice(toks, ...)`
    where toks is the inline split/normalize chain) re-evaluates the
    whole tokenization once per gram — measured 7x slower on the
    gram explode than referencing a staged attribute."""
    staged = df.withColumn("_mimeo_toks", norm_tokens(F.col(text_col)))
    return staged.withColumn(
        out,
        F.transform(
            shingles_from_tokens(F.col("_mimeo_toks"), n), shingle_hash
        ),
    ).drop("_mimeo_toks")


def band_hash_array(sig: Column, k: int = 16, bands: int = 4) -> Column:
    """The LSH banding primitive shared by the batch pipeline and the
    incremental index: split a k-value MinHash signature into `bands`
    contiguous rows-per-band slices and hash each slice to one
    bucket string.  Band b of an identical slice always lands in the
    same bucket on every engine (md5 over the comma-joined decimal
    values)."""
    rows = k // bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(
            F.array_join(
                F.transform(
                    F.slice(sig, b * rows + 1, rows),
                    lambda v: v.cast("string"),
                ),
                ",",
            )
        ),
    )


def with_minhash(df: DataFrame, text_col: str = "text", k: int = 16,
                 n: int = 3) -> DataFrame:
    staged = with_shingle_hashes(df, text_col, n)
    return staged.withColumn(
        "minhash", minhash_from_hashes(F.col("_hs"), k)
    ).drop("_hs")


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    max_bucket: int = 64,
    persist_reps: bool = True,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, duplicate-hardened.

    Stage 1 (exact collapse): docs with an identical normalized-text
    fingerprint form one group; each non-canonical member links to the
    group's canonical (min id) with jaccard = 1.0 — identical
    normalized text means identical shingle sets, so 1.0 is exact.
    This makes an m-doc identical cluster cost m-1 output rows instead
    of the m^2 pairs a naive band join would emit — the normal case on
    crawled training data.

    Stage 2 (banding, canonical reps only): band the MinHash
    signature; drop (band, band_hash) buckets with more than
    `max_bucket` members (window count — a real cap, so one degenerate
    bucket can never hand a reducer a quadratic join); self-join IDS
    ONLY on (band, band_hash); distinct the candidate id-pairs; then
    re-join the sorted shingle-hash arrays once per side for the exact
    Jaccard rerank.  The heavy arrays never ride through the band
    explode or the self-join.

    The representative frame (id, shingle hashes, signature) feeds the
    banding and both rerank joins; `persist_reps` materializes it once
    (MEMORY_AND_DISK) — the signature-table materialization every
    production LSH pipeline does — instead of recomputing shingle md5
    per consumer."""
    fp = df.select(
        F.col(id_col).alias("_id"),
        fingerprint(F.col(text_col)).alias("_fp"),
    )
    if persist_reps:
        from pyspark.storagelevel import StorageLevel

        # fp feeds the group agg AND the member join: one narrow
        # (id, 32-char hash) cache saves a full re-scan + re-hash.
        fp = fp.persist(StorageLevel.MEMORY_AND_DISK)
    groups = fp.groupBy("_fp").agg(F.min("_id").alias("_canon"))
    member_pairs = (
        fp.join(groups, on="_fp")
        .filter(F.col("_id") != F.col("_canon"))
        .select(
            F.col("_canon").alias("id_a"),
            F.col("_id").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )

    staged = with_shingle_hashes(df, text_col, n).select(
        F.col(id_col).alias("_id"),
        F.array_sort(F.array_distinct(F.col("_hs"))).alias("_sh"),
        minhash_from_hashes(F.col("_hs"), k).alias("_sig"),
    )
    reps = staged.join(
        groups.select(F.col("_canon").alias("_id")), on="_id", how="left_semi"
    )
    if persist_reps:
        from pyspark.storagelevel import StorageLevel

        reps = reps.persist(StorageLevel.MEMORY_AND_DISK)

    banded = reps.select(
        "_id",
        F.posexplode(
            band_hash_array(F.col("_sig"), k, bands)
        ).alias("band", "band_hash"),
    )
    from pyspark.sql import Window

    bucket_w = Window.partitionBy("band", "band_hash")
    sized = banded.withColumn("_bn", F.count(F.lit(1)).over(bucket_w))
    capped = sized.filter(F.col("_bn") <= max_bucket).drop("_bn")
    stats = drop_stats(
        sized, ["band", "band_hash"], max_bucket, "lsh_candidate_pairs"
    )
    a, b = capped.alias("a"), capped.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
        )
        .distinct()
    )
    rerank = (
        cand.join(
            reps.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a")),
            on="id_a",
        )
        .join(
            reps.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b")),
            on="id_b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.size("sh_a") + F.size("sh_b") - inter)
    scored = rerank.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    out = member_pairs.unionByName(scored)
    if persist_reps:
        out = register_persisted(out, fp, reps)
    return register_cap_stats(out, stats)


def resolve_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Near-dup pairs -> transitive clusters with one canonical per
    cluster: the keep-one-per-cluster step that turns LSH/SimHash PAIR
    output into an actual dedup decision.  Returns (doc_id,
    canonical_id) for every id appearing in `pairs`; canonical = the
    minimum id of the connected component (rows with doc_id ==
    canonical_id are the kept representatives).

    Distributed min-label propagation with pointer jumping — no graph
    library needed:
      1. every node starts labeled with itself;
      2. each round, a node takes the min of its own label and its
         neighbors' labels (one groupBy over the edge list), then
         jumps to its label's label (one self-join) — the jump halves
         path lengths, so convergence is O(log diameter) rounds, not
         O(diameter);
      3. each round is localCheckpoint()ed: iterative plans otherwise
         grow a lineage Catalyst re-optimizes from scratch every
         action, and the checkpoint also bounds recovery cost;
      4. stop when a round changes no label (one count per round —
         the explicit action is the point: it is the convergence
         barrier).
    Per round: two shuffles over the EDGE list (not the corpus), both
    keyed by node id.  A 10^9-edge pair set at 100 TB runs ~log2(max
    cluster diameter) rounds; real near-dup clusters are shallow (most
    are stars around one canonical), so 3-5 rounds is typical."""
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    )
    edges = (
        edges.unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=False)
    )
    if max_iters < 1:
        raise ValueError("max_iters must be >= 1")
    changed = -1
    for _ in range(max_iters):
        nbr = (
            edges.join(
                labels.select(
                    F.col("id").alias("src"),
                    F.col("label").alias("src_label"),
                ),
                on="src",
            )
            .groupBy("dst")
            .agg(F.min("src_label").alias("nbr_label"))
        )
        # the round's input label rides along as _old so the
        # convergence count below is a plain filter on the jumped
        # frame — not an extra join back against the previous labels
        stepped = labels.join(
            nbr, labels["id"] == nbr["dst"], "left"
        ).select(
            "id",
            F.col("label").alias("_old"),
            F.least(
                F.col("label"), F.coalesce("nbr_label", "label")
            ).alias("label"),
        )
        jumped = (
            stepped.alias("x")
            .join(
                stepped.select(
                    F.col("id").alias("_lid"),
                    F.col("label").alias("_llabel"),
                ),
                F.col("x.label") == F.col("_lid"),
                "left",
            )
            .select(
                F.col("x.id").alias("id"),
                F.col("x._old").alias("_old"),
                F.coalesce("_llabel", F.col("x.label")).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        changed = jumped.filter(
            F.col("label") != F.col("_old")
        ).count()
        labels = jumped.select("id", "label")
        if changed == 0:
            break
    else:
        # exhausting max_iters without a zero-change round means the
        # labels are NOT canonical assignments — silently returning
        # them would corrupt every downstream keep/drop decision
        raise RuntimeError(
            f"resolve_clusters did not converge in {max_iters} rounds "
            f"({changed} labels still changing); raise max_iters — "
            "pointer jumping needs ~log2(cluster diameter) rounds"
        )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("canonical_id")
    )


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_matches: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing at
    least `min_matches` distinct word n-grams with ANY document in the
    eval set (the n-gram overlap check production pretraining corpora
    run against held-out benchmarks; 13-grams at full scale — `n` is a
    parameter because the sandbox fixtures are short).

    Plan shape: the eval side collapses to its DISTINCT n-gram hash
    set (tiny — benchmarks are a few MB even when the corpus is
    100 TB) and is BROADCAST; the train side explodes to (id, hash)
    pairs and inner-joins the broadcast set, so the corpus streams
    once with no shuffle for the join — the only exchange is the final
    per-doc count aggregation.  Returns (doc_id, n_matched_ngrams) for
    contaminated docs only; anti-join the result against the corpus to
    drop them."""
    # tokens staged as a real column on both sides: the gram lambda
    # re-evaluates a free inline tokenization once per gram (HOFs are
    # interpreted, no codegen subexpression elimination)
    eval_grams = F.broadcast(
        eval_set.select(norm_tokens(F.col(text_col)).alias("_toks"))
        .select(
            F.explode(
                F.transform(
                    shingles_from_tokens(F.col("_toks"), n), shingle_hash
                )
            ).alias("_g")
        ).distinct()
    )
    train_grams = train.select(
        F.col(id_col).alias("doc_id"),
        norm_tokens(F.col(text_col)).alias("_toks"),
    ).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    shingles_from_tokens(F.col("_toks"), n), shingle_hash
                )
            )
        ).alias("_g"),
    )
    return (
        train_grams.join(eval_grams, on="_g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched_ngrams"))
        .filter(F.col("n_matched_ngrams") >= min_matches)
    )


def decontaminate_graded(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_min: int = 5,
    n_max: int = 13,
) -> DataFrame:
    """Graded decontamination: for every (train, eval) document pair
    sharing at least one `n_min`-gram, the length of the LONGEST
    shared word n-gram (probed up to `n_max`) — near-verbatim leakage
    is graded, not just hit-counted (a 13-gram match is a different
    problem than one shared 5-gram).  Output: (doc_id, eval_id,
    longest_n), longest_n in [n_min, n_max].

    Plan shape, same discipline as :func:`decontaminate`: the eval
    side collapses to its distinct (n, gram-hash, eval_id) triples —
    still benchmark-sized, broadcast — and the train side streams
    ONCE: tokens are staged as one column and every probe length's
    grams come off that array in a single flattened explode, so the
    multi-n probe costs one scan + a wider explode, not one scan per
    n.  The only shuffle is the final per-pair max.  Short texts
    yield no grams at lengths beyond their token count (pad_short
    off), so longest_n always describes a real n-token window."""
    ns = list(range(n_min, n_max + 1))

    def gram_structs(df: DataFrame, keep) -> DataFrame:
        # tokens staged as a real column: each probe length references
        # the array attribute, not 9 inlined copies of the
        # split/normalize chain (the duplicated-expression disease)
        staged = df.select(
            *keep, norm_tokens(F.col(text_col)).alias("_toks")
        )
        # NB: the HOF lambda must take ONE arg — a two-parameter
        # lambda (even `lambda g, n=n`) makes pyspark pass the array
        # INDEX as the second argument instead of the closure value
        def tag(n: int):
            return lambda g: F.struct(
                F.lit(n).alias("_n"), shingle_hash(g).alias("_g")
            )

        per_n = [
            F.transform(
                shingles_from_tokens(F.col("_toks"), n, pad_short=False),
                tag(n),
            )
            for n in ns
        ]
        return staged.select(
            *keep, F.explode(F.flatten(F.array(*per_n))).alias("_s")
        ).select(
            *keep, F.col("_s._n").alias("_n"), F.col("_s._g").alias("_g")
        )

    ev = F.broadcast(
        gram_structs(
            eval_set.select(F.col(id_col).alias("eval_id"), text_col),
            ["eval_id"],
        ).distinct()
    )
    tr = gram_structs(
        train.select(F.col(id_col).alias("doc_id"), text_col), ["doc_id"]
    )
    return (
        tr.join(ev, on=["_n", "_g"])
        .groupBy("doc_id", "eval_id")
        .agg(F.max("_n").cast("int").alias("longest_n"))
    )


def ngram_jaccard(text_a: Column, text_b: Column, n: int = 3) -> Column:
    """Exact n-gram Jaccard similarity between two texts."""
    a, b = shingles(text_a, n), shingles(text_b, n)
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup on the normalized-text fingerprint: one
    hash-aggregate; keeps the minimum id as the canonical doc."""
    return (
        df.select(
            fingerprint(F.col(text_col)).alias("fingerprint"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("_id").alias("canonical_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def simhash_from_hashes(th: Column, bits: int = 32) -> Column:
    """Packed SimHash from an already-hashed token array: one per-bit
    vote aggregate over `th` per bit.  `th` should be a REAL staged
    column (see with_simhash) — each of the `bits` aggregates
    references it, and if it is an inline expression Catalyst's
    projection collapse duplicates the tokenize+md5 work `bits` times
    (measured 10x slowdown at bits=32)."""
    def vote_step(mask: int):
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask)) != 0, 1
        ).otherwise(-1)

    packed = F.lit(0).cast("long")
    for b in range(bits):  # bits is a plan-time constant
        mask = 1 << b
        vote = F.aggregate(th, F.lit(0), vote_step(mask))
        packed = packed.bitwiseOR(
            F.when(vote > 0, F.lit(mask).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return packed


def token_hashes(text: Column) -> Column:
    """md5-derived uint32 hash per whitespace token of normalized text."""
    toks = F.split(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "), " ")
    return F.transform(toks, lambda t: shingle_hash(t))


def simhash64(text: Column, bits: int = 32) -> Column:
    """SimHash over whitespace tokens, as a single Column expression.

    NOTE: inlines the tokenize+md5 transform into every per-bit vote —
    use only for one-off expressions.  Query paths should stage the
    hashed token array once via `with_simhash` (bits x less md5 work)."""
    return simhash_from_hashes(token_hashes(text), bits)


def with_simhash(
    df: DataFrame, text_col: str = "text", bits: int = 32,
    out: str = "simhash",
) -> DataFrame:
    """Project the hashed token array as a real column, then pack the
    signature — keeps the tokenize+md5 work at one evaluation per row
    (same staging discipline as with_shingle_hashes)."""
    staged = df.withColumn("_th", token_hashes(F.col(text_col)))
    return staged.withColumn(
        out, simhash_from_hashes(F.col("_th"), bits)
    ).drop("_th")


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
    n_blocks: int = 4,
    max_block: int = 256,
) -> DataFrame:
    """SimHash near-dup pairs via multi-table blocking.

    The `bits`-bit signature splits into `n_blocks` contiguous blocks;
    a pair within hamming distance n_blocks - 1 must agree EXACTLY on
    at least one block (pigeonhole), so joining per (block_id,
    block_value) has 100% recall for max_hamming <= n_blocks - 1 —
    unlike top-bits-only blocking, which silently misses near-dups
    that differ in the chosen bits.  Blocks larger than `max_block`
    are dropped before the self-join (same cap discipline as LSH
    banding), and candidate pairs are deduped before the hamming
    filter.

    The capped block frame feeds BOTH sides of the self-join; it is
    narrow (id + one long + two block columns) and persisting it keeps
    the 32-bit signature computation (a JIT-heavy generated
    expression) from running once per side — measured at sf0.1:
    steady-state 8.4s -> 2.0s, for ~25% extra first-run cache-build
    cost."""
    assert bits % n_blocks == 0, "bits must divide evenly into blocks"
    assert max_hamming <= n_blocks - 1, (
        "pigeonhole recall guarantee requires max_hamming <= n_blocks-1"
    )
    bw = bits // n_blocks
    mask = (1 << bw) - 1
    sh = with_simhash(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text")),
        "_text", bits, out="_sh",
    ).select("_id", "_sh")
    blocked = sh.select(
        "_id",
        "_sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("_sh", j * bw).bitwiseAND(F.lit(mask))
                    for j in range(n_blocks)
                ]
            )
        ).alias("block_id", "block_val"),
    )
    from pyspark.sql import Window

    block_w = Window.partitionBy("block_id", "block_val")
    from pyspark.storagelevel import StorageLevel

    # the sized frame (block rows + window count) is persisted — it
    # feeds both self-join sides AND the drop-accounting aggregate.
    sized = blocked.withColumn(
        "_bn", F.count(F.lit(1)).over(block_w)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    capped = sized.filter(F.col("_bn") <= max_block).drop("_bn")
    stats = drop_stats(
        sized, ["block_id", "block_val"], max_block, "simhash_near_dups"
    )
    a, b = capped.alias("a"), capped.alias("b")
    hamming = F.bit_count(F.col("a._sh").bitwiseXOR(F.col("b._sh")))
    out = (
        a.join(
            b,
            (F.col("a.block_id") == F.col("b.block_id"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming.cast("long").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return register_cap_stats(register_persisted(out, sized), stats)


def fuzzy_name_pairs(
    df: DataFrame,
    name_col: str,
    block_len: int = 4,
    max_dist: int = 3,
    max_block: int = 1024,
) -> DataFrame:
    """Entity-resolution candidate pairs by blocked edit distance:
    distinct values of `name_col` whose Levenshtein distance is at
    most `max_dist`, compared only WITHIN a block — TWO blocking
    passes, a shared `block_len`-char PREFIX and a shared
    `block_len`-char REVERSED prefix (suffix), unioned.  A single
    prefix pass is structurally blind to edits inside the first
    `block_len` characters (a first-char typo lands the two names in
    different blocks forever); the suffix pass makes those reachable,
    the standard multi-pass blocking recipe.  A length band of +/-
    `max_dist` rides both passes.  Output: (name_a, name_b, dist),
    name_a < name_b, deduped across passes BEFORE the distance rerank.

    Scale design, same discipline as the other pair generators:
    distinct-first (the pair space is over the name VOCABULARY, not
    rows), equi-join on the block key only — the length-band and
    distance predicates are residual filters on block-local pairs,
    never a corpus cross join — and blocks above `max_block` are
    dropped with the drop-stats side channel (a block that big means
    the key is degenerate, e.g. a shared template; pairing inside it
    is quadratic noise).  Levenshtein itself is JVM codegen
    (F.levenshtein) and DuckDB's levenshtein is unit-cost identical,
    so the whole operator is oracle-checkable."""
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    from ..cacheutil import register_cap_stats, register_persisted

    names = (
        df.select(F.col(name_col).cast("string").alias("name"))
        .filter(F.col("name").isNotNull() & (F.length("name") > 0))
        .distinct()
        .select(
            "name",
            F.length("name").alias("_len"),
            F.explode(
                F.array(
                    F.concat(
                        F.lit("p:"), F.substring("name", 1, block_len)
                    ),
                    F.concat(
                        F.lit("s:"),
                        F.substring(F.reverse(F.col("name")), 1, block_len),
                    ),
                )
            ).alias("_blk"),
        )
    )
    sized = names.withColumn(
        "_bn", F.count(F.lit(1)).over(Window.partitionBy("_blk"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    capped = sized.filter(F.col("_bn") <= max_block).drop("_bn")
    stats = drop_stats(sized, ["_blk"], max_block, "fuzzy_name_pairs")
    a, b = capped.alias("a"), capped.alias("b")
    out = (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a.name") < F.col("b.name"))
            & (
                F.abs(F.col("a._len") - F.col("b._len"))
                <= F.lit(max_dist)
            ),
        )
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
        )
        # a pair found by both passes must rerank once, not twice
        .distinct()
        .withColumn("dist", F.levenshtein(F.col("name_a"), F.col("name_b")))
        .filter(F.col("dist") <= max_dist)
    )
    return register_cap_stats(register_persisted(out, sized), stats)


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pos_modulus: int = 1_000_000,
    single_scan: bool = True,
) -> DataFrame:
    """Corpus-global line-level deduplication (the C4 recipe,
    cf. "Exploring the Limits of Transfer Learning" §2.2): every
    line whose normalized form (lower + trim) occurs anywhere else in
    the corpus survives only at its FIRST occurrence — (min doc id,
    then min line position) — and is removed everywhere else.  Web
    boilerplate that repeats verbatim across pages (cookie banners,
    footers, navigation) is exactly such a line.  Blank /
    whitespace-only lines are dropped outright.  Output, one row per
    input document: (id, n_lines, n_kept, clean_text) where
    clean_text re-joins the surviving lines in original order and
    n_lines counts the non-blank input lines.

    Scale shape: ONE corpus scan feeds the whole pipeline —
    posexplode to (id, pos, line) with a blank flag carried through
    (blank rows stay, so every input doc reaches the final
    aggregation and no join back to the source is needed);
    first-occurrence is an integer-key `min` aggregation per line
    hash over the non-blank rows (map-side partial combine collapses
    each partition's repeats BEFORE the shuffle, which is what makes
    a line repeated a billion times survivable); one equi-join of the
    lines against that distinct-hash frame (AQE skew-split applies —
    the downstream groupBy is on the doc id, not the join key, so the
    split is not blocked); then one per-doc aggregation whose
    kept-lines ordering is array_sort over (pos, line) structs — no
    global sort, no window over the corpus.  With `single_scan` the
    exploded frame is persisted for its two consumers (the tfidf
    pattern); pass False on a cluster where re-scanning the source
    is cheaper than caching the exploded corpus.  The
    first-occurrence key packs (id, pos) into one BIGINT
    (`id * pos_modulus + pos`) so the `min` stays a primitive-typed
    aggregate on every engine; the packing requires every document to
    have fewer than `pos_modulus` lines — raise the modulus for
    pathological inputs (BIGINT holds id * modulus up to ~9e18).
    """
    lid = F.col(id_col).cast("long")
    lines = df.select(
        lid.alias("_id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("_pos", "_line"),
    ).select(
        "_id",
        "_pos",
        "_line",
        (F.length(F.trim(F.col("_line"))) > 0).alias("_nb"),
        F.md5(F.lower(F.trim(F.col("_line")))).alias("_lhash"),
        (F.col("_id") * F.lit(pos_modulus) + F.col("_pos")).alias("_okey"),
    )
    if single_scan:
        lines = lines.persist()
    first = (
        lines.filter(F.col("_nb"))
        .groupBy("_lhash")
        .agg(F.min("_okey").alias("_keep"))
    )
    flagged = lines.join(first, "_lhash", "left").select(
        "_id",
        "_pos",
        "_line",
        "_nb",
        F.coalesce(
            F.col("_nb") & (F.col("_okey") == F.col("_keep")), F.lit(False)
        ).alias("_kept"),
    )
    out = flagged.groupBy("_id").agg(
        F.sum(F.col("_nb").cast("long")).cast("long").alias("n_lines"),
        F.sum(F.col("_kept").cast("long")).cast("long").alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_kept"),
                            F.struct(
                                F.col("_pos").alias("p"),
                                F.col("_line").alias("l"),
                            ),
                        )
                    )
                ),
                lambda x: x["l"],
            ),
        ).alias("clean_text"),
    ).select(
        F.col("_id").alias(id_col), "n_lines", "n_kept", "clean_text"
    )
    return register_persisted(out, lines) if single_scan else out


def bloom_decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    k: int = 4,
    m_bits: int = 4096,
    min_matches: int = 1,
) -> DataFrame:
    """Bloom-filter decontamination: the broadcast-bitset form of
    `decontaminate`.  That operator broadcasts the eval set's DISTINCT
    gram hashes — fine for benchmark-sized eval sets, unbounded when
    the deny-set is itself web-scale (a blocklist of billions of
    grams).  Here the deny-set collapses to an m_bits bitset
    (sketches.bloom_build) whose broadcast cost is CONSTANT in the
    deny-set size, at the price of a designed false-positive rate
    (~(1-e^(-kn/m))^k) — and zero false negatives, so every truly
    contaminated doc is still flagged.

    Per train doc: distinct-gram count, bloom-hit count, and the
    contaminated flag (hits >= min_matches).  All docs are returned
    (not just flagged ones) so the false-positive behaviour is
    observable.  One corpus scan; the only shuffles are the two
    map-side-combined aggregations (per (doc, gram), then per doc)."""
    from .sketches import bloom_build, bloom_contains

    # tokens staged (see decontaminate): HOF lambdas re-evaluate an
    # inline tokenization per gram
    eval_grams = eval_set.select(
        norm_tokens(F.col(text_col)).alias("_toks")
    ).select(
        F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("gram")
    ).distinct()
    bloom = bloom_build(eval_grams, "gram", k=k, m_bits=m_bits)
    train_grams = train.select(
        F.col(id_col).alias("doc_id"),
        norm_tokens(F.col(text_col)).alias("_toks"),
    ).select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles_from_tokens(F.col("_toks"), n))
        ).alias("gram"),
    )
    hits = bloom_contains(
        bloom, train_grams, "gram", k=k, m_bits=m_bits, carry=("doc_id",)
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.col("maybe_member").cast("long")).alias(
                "n_bloom_hits"
            ),
        )
        .withColumn(
            "contaminated", F.col("n_bloom_hits") >= min_matches
        )
    )


def corpus_overlap(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    n: int = 3,
    k: int = 64,
    with_exact: bool = True,
) -> DataFrame:
    """Corpus-level overlap between two document sets, WITHOUT any
    pairwise doc comparison: the MinHash signature of a gram SET is
    the elementwise min over its members, so a whole corpus's
    signature is ONE map-side-combined aggregation (min per
    permutation) over the exploded gram stream — signatures from
    disjoint shards combine by elementwise min, exactly like the
    count-min/bloom sketches combine by sum/or.  Estimated Jaccard =
    fraction of agreeing signature slots (stderr ~ sqrt(J(1-J)/k)).

    `with_exact` also computes the exact distinct-gram Jaccard (two
    distinct-aggregations + one join) as the verification baseline —
    that path shuffles the gram space and is the one you'd DROP at
    100 TB, which is the point of the estimate.  Each corpus's
    gram-hash stream is persisted (narrow: one long column) so the
    corpus is SCANNED once however many consumers read it (signature,
    distinct count, intersection).  Returns one row: gram counts,
    intersection/union, exact and estimated Jaccard (rounded to 6
    for cross-engine hashing)."""
    from pyspark.storagelevel import StorageLevel

    params = minhash_params(k)

    def gram_hashes(df: DataFrame) -> DataFrame:
        # tokens staged (see decontaminate): HOF lambdas re-evaluate
        # an inline tokenization per gram
        return (
            df.select(norm_tokens(F.col(text_col)).alias("_toks"))
            .select(
                F.explode(
                    shingles_from_tokens(F.col("_toks"), n)
                ).alias("s")
            )
            .select(shingle_hash(F.col("s")).alias("h"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

    ha, hb = gram_hashes(a), gram_hashes(b)

    def sig(hashes: DataFrame, tag: str) -> DataFrame:
        return hashes.agg(
            *[
                F.min((F.col("h") * pa + pb) % MINHASH_PRIME).alias(
                    f"{tag}{i}"
                )
                for i, (pa, pb) in enumerate(params)
            ]
        )

    agree = sum(
        (F.col(f"_a{i}") == F.col(f"_b{i}")).cast("int")
        for i in range(k)
    )
    out = (
        sig(ha, "_a")
        .crossJoin(sig(hb, "_b"))  # two 1-row frames
        .select(
            F.lit(k).cast("long").alias("k"),
            agree.cast("long").alias("n_agree"),
            F.round(agree / F.lit(k), 6).alias("est_jaccard"),
        )
    )
    if not with_exact:
        return register_persisted(out, ha, hb)

    ga, gb = ha.distinct(), hb.distinct()
    na = ga.agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    nb = gb.agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    ni = ga.join(gb, "h").agg(
        F.count(F.lit(1)).cast("long").alias("n_intersect")
    )
    exact = (
        na.crossJoin(nb)
        .crossJoin(ni)
        .select(
            "n_a",
            "n_b",
            "n_intersect",
            (F.col("n_a") + F.col("n_b") - F.col("n_intersect")).alias(
                "n_union"
            ),
        )
        .withColumn(
            "exact_jaccard",
            F.round(F.col("n_intersect") / F.col("n_union"), 6),
        )
    )
    return register_persisted(exact.crossJoin(out), ha, hb)


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int = 64,
) -> DataFrame:
    """Shingle-containment near-dup pairs: for each candidate pair the
    score is C = |A ∩ B| / min(|A|, |B|) over distinct word n-gram
    shingle sets — the measure that catches a document CONTAINED in
    another (quote expansion, page aggregation, boilerplate-wrapped
    reposts).  Symmetric Jaccard structurally under-scores these:
    for A ⊂ B, J(A,B) = |A|/|B|, so a short doc embedded in a 10x
    longer one scores 0.1 and slips every MinHash band, while its
    containment is 1.0.

    Exact within a df-capped inverted index (no MinHash estimate):
    explode distinct shingle hashes, drop shingles present in more
    than `max_df` docs (stopword-grams fan out quadratically while
    identifying nothing — same cap discipline as the LSH buckets) or
    fewer than 2 (can't pair), self-join per shingle, count common
    shingles per pair, containment from the FULL stored set sizes.

    Scale shape: the pair space is bounded by sum over kept shingles
    of df^2 <= max_df * |postings| — linear in corpus size for fixed
    max_df, never O(n_docs^2).  Two shuffles (shingle df, pair
    groupBy), both map-side combined; the df filter is a semi-join
    against a vocabulary-sized frame (equi-join, NOT broadcast — the
    vocabulary outgrows any broadcast budget at corpus scale).
    Dropped-shingle containment is therefore a floor: a pair sharing
    only capped shingles is missed, disclosed the same way the LSH
    bucket cap is.

    Output: (id_a, id_b, common, size_a, size_b, containment),
    id_a < id_b, containment rounded to 6, filtered to >= threshold.

    The exploded (id, sz, h) frame feeds THREE consumers (the df
    count and both sides of the per-shingle self-join), so it is
    persisted — narrow (3 columns) and the per-gram md5 upstream is
    the expensive part; `ensure_compute_parallelism` decouples that
    CPU-bound hashing from the input split count (a single-file
    sandbox corpus otherwise hashes on one core).
    """
    from pyspark.storagelevel import StorageLevel

    from ..cacheutil import ensure_compute_parallelism, register_persisted

    df = ensure_compute_parallelism(df)
    # tokens staged (see decontaminate): HOF lambdas re-evaluate an
    # inline tokenization per gram.  The persist sits BEFORE the
    # explode (same barrier as winnow_pairs): explode's inferred
    # `size(_sh) > 0` filter would otherwise be rewritten in terms of
    # the full tokenize+gram+md5 chain and pushed below the widening
    # repartition onto the raw scan, re-running the shingling several
    # times per row on one task per input split during the cache
    # build.  Exploding AFTER the InMemoryRelation touches only the
    # cached array attribute.
    shsets = df.select(
        F.col(id_col).alias("id"),
        norm_tokens(F.col(text_col)).alias("_toks"),
    ).select(
        "id",
        F.array_sort(
            F.array_distinct(
                F.transform(
                    shingles_from_tokens(F.col("_toks"), n), shingle_hash
                )
            )
        ).alias("_sh"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sh = shsets.select(
        "id",
        F.size("_sh").cast("long").alias("sz"),
        F.explode("_sh").alias("h"),
    )
    keep = (
        sh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter((F.col("_df") >= 2) & (F.col("_df") <= max_df))
        .select("h")
    )
    exk = sh.join(keep, "h", "left_semi")
    a, b = exk.alias("a"), exk.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sz").alias("size_a"),
            F.col("b.sz").alias("size_b"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        pairs.select(
            "id_a",
            "id_b",
            "common",
            "size_a",
            "size_b",
            F.round(
                F.col("common") / F.least("size_a", "size_b"), 6
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )
    return register_persisted(out, shsets)
