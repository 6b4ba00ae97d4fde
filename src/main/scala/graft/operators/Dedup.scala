package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every variant is banded/bucketed so candidate-pair
  * generation is a self-join on a bucket key — never an all-pairs
  * cross join. At 100 TB the bucket join shuffles each side once on
  * the bucket hash; skewed buckets (boilerplate-heavy corpora) are
  * split by AQE skew-join handling.
  */
object Dedup {

  /** Deterministic 64-bit mixer (public-domain splitmix64 constants)
    * for deriving the minhash affine-family coefficients. */
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private val P31 = 2147483647L // 2^31 - 1, the replayable-family field

  /** Affine-family coefficients for [[minhashLsh]]: `k` (mult, add)
    * pairs derived from splitmix64. Production family: full-width odd
    * multipliers, Long-wrap arithmetic. Replayable family: coefficients
    * reduced into the mod-2^31-1 field so `(m*h + a) % p` never
    * exceeds 2^62 — DuckDB's checked BIGINT arithmetic replays it
    * bit-for-bit. Public so the SQL oracle is generated from the SAME
    * constants as the engine (no drift).
    */
  def minhashCoeffs(k: Int, replayable: Boolean): (Seq[Long], Seq[Long]) =
    if (replayable)
      ((0 until k).map(i => ((splitmix64(2L * i) & Long.MaxValue) % (P31 - 1)) + 1L),
        (0 until k).map(i => (splitmix64(2L * i + 1) & Long.MaxValue) % P31))
    else
      ((0 until k).map(i => splitmix64(2L * i) | 1L),
        (0 until k).map(i => splitmix64(2L * i + 1)))

  /** Exact dedup by content hash: keep the first document (lowest id)
    * per normalized-text hash. One shuffle on the hash.
    */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    exactBy(docs, sha2(norm, 256), idCol)
  }

  /** First-wins dedup by an ARBITRARY key expression (a fingerprint
    * column, a URL, a composite): keep the lowest-`idCol` row per key.
    * Argmin aggregate — duplicate groups collapse map-side and the one
    * shuffle carries survivors only, where the rank-1 window form
    * sort-shuffled the whole input.
    */
  def exactBy(docs: DataFrame, key: Column, idCol: String): DataFrame =
    exactByOrd(docs, key, col(idCol))

  /** [[exactBy]] with an ARBITRARY argmin ordering — e.g. a source
    * trust rank tie-broken by id, so cross-source duplicates resolve
    * to the most trusted copy rather than the lowest id. Same
    * map-side-collapse aggregate shape (one shuffle, survivors only).
    * `ord` must be a total order over each key group for the survivor
    * to be deterministic.
    */
  def exactByOrd(docs: DataFrame, key: Column, ord: Column): DataFrame = {
    val clashes = docs.columns.filter(Seq("__h", "__best").contains)
    require(clashes.isEmpty,
      s"exactByOrd reserves columns __h, __best; input already has " +
        s"${clashes.mkString(", ")} — rename before dedup")
    val best = docs.groupBy(key.as("__h"))
      .agg(min_by(struct(docs.columns.map(col).toIndexedSeq: _*),
        ord).as("__best"))
    best.select(docs.columns.map(c =>
      col("__best").getField(c).as(c)).toIndexedSeq: _*)
  }

  /** MinHash signature: k independent permutation-approximations of
    * the shingle set, each `min(hash(seed_i, shingle))`. */
  def minhashSig(shingles: Column, k: Int): Column = {
    val hashes = (0 until k).map { i =>
      array_min(transform(shingles, s => hash(lit(i), s)))
    }
    array(hashes: _*)
  }

  /** Candidate pairs from a banded frame (`keys... , id, payload...`):
    * rows sharing a band key pair up. With `maxBucket` set, buckets
    * over the cap emit the STAR around the bucket's min id instead of
    * the full clique. This is the guard for degenerate corpora
    * (boilerplate at percent-level frequency): at 20% document
    * frequency an uncapped bucket is (0.2·N)²/2 pairs — quadratic in
    * corpus size — where the star is linear.
    *
    * Semantics of the trade, precisely:
    *   - At the CANDIDATE-graph level (bucket co-membership taken as
    *     the edge), clique and star have identical connected
    *     components, so a consumer that clusters raw candidates sees
    *     the same clusters at O(n) pairs instead of O(n²).
    *   - Once a downstream EXACT-distance filter runs (est_jaccard
    *     threshold in [[minhashLsh]] consumers, `hamming <= maxHamming`
    *     in [[simhashNearDup]]), the cap is a BOUNDED RECALL LOSS, not
    *     cluster-equivalent: two over-cap bucket members near each
    *     other but far from the hub have only hub-mediated candidate
    *     edges, and the distance filter removes those edges before any
    *     cluster step — the (a, b) near-pair is silently absent, not
    *     deferred. The loss is confined to over-cap buckets (cap
    *     defaults to None = exact clique semantics, the oracle-replayed
    *     default) and is the standard LSH-at-scale trade: a bucket that
    *     big is boilerplate, and per-pair fidelity inside it is
    *     deliberately sacrificed for linear work.
    *
    * `payload` columns ride along as `<p>_a`/`<p>_b` (the hub's
    * payload via min_by, so star pairs are exact).
    */
  private[graft] def bandPairs(banded: DataFrame, keys: Seq[String],
                               maxBucket: Option[Int],
                               payload: Seq[String] = Nil): DataFrame = {
    val kc = keys.map(col)
    val outCols = ("id_a" +: "id_b" +:
      payload.flatMap(p => Seq(s"${p}_a", s"${p}_b"))).map(col)
    def side(df: DataFrame, s: String) =
      df.select(kc ++ ("id" +: payload).map(c => col(c).as(s"${c}_$s")): _*)
    def clique(df: DataFrame) =
      side(df, "a").join(side(df, "b"), keys)
        .filter(col("id_a") < col("id_b"))
        .select(outCols: _*)
    maxBucket match {
      case None => clique(banded)
      case Some(cap) =>
        require(cap >= 2, "maxBucket must be >= 2")
        // one aggregate on the band key: bucket size + the hub (min
        // id) with its payload
        val aggs = count(lit(1)).as("__n") +: min(col("id")).as("__hub") +:
          payload.map(p => min_by(col(p), col("id")).as(s"__hub_$p"))
        val sizes = banded.groupBy(kc: _*).agg(aggs.head, aggs.tail: _*)
        val small = banded.join(
          sizes.filter(col("__n") <= cap).select(kc: _*), keys, "left_semi")
        val star = banded.join(
          sizes.filter(col("__n") > cap), keys)
          .filter(col("id") =!= col("__hub"))
          .select(col("__hub").as("id_a") +: col("id").as("id_b") +:
            payload.flatMap(p => Seq(col(s"__hub_$p").as(s"${p}_a"),
              col(p).as(s"${p}_b"))): _*)
        clique(small).unionByName(star)
    }
  }

  /** The signature half of [[minhashLsh]] on its own: (id, sig) rows,
    * ready to persist as a signature STORE — the asset an incremental
    * corpus keeps so tomorrow's delta ([[minhashLshDelta]]) never
    * re-reads yesterday's text. Documents shorter than one shingle
    * window yield no row (null signature), as in [[minhashLsh]].
    */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
                        shingleLen: Int = 5, bands: Int = 8,
                        rowsPerBand: Int = 4, maxDocLen: Int = 2000,
                        replayable: Boolean = false): DataFrame = {
    val k = bands * rowsPerBand
    val (mults, adds) = minhashCoeffs(k, replayable)
    docs.select(col(idCol).as("id"),
      graft.plans.TextExpressions.minhashSigFast(
        T.normText(substring(col(textCol), 1, maxDocLen)), shingleLen,
        mults, adds, poly = replayable).as("sig"))
      .filter(col("sig").isNotNull)
  }

  /** Explode a (id, sig, carry...) frame into (id, carry..., band,
    * bucket) rows — the shared banding step of the LSH forms. The
    * bucket is murmur3 of the band slice (production) or a base-31
    * fold in the mod-2^31-1 field (replayable — stays < 2^36, replays
    * in checked BIGINT SQL).
    */
  private def explodeBands(withSig: DataFrame, bands: Int, rowsPerBand: Int,
                           replayable: Boolean,
                           carry: Seq[String]): DataFrame = {
    def bucketOf(b: Column): Column =
      if (replayable)
        (0 until rowsPerBand).foldLeft(lit(0L)) { (acc, j) =>
          (acc * 31L + element_at(col("sig"), b * rowsPerBand + lit(j + 1))) % P31
        }
      else hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))
    withSig.select(col("id") +: carry.map(col) :+
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"), bucketOf(b).as("bucket")))).as(Seq("pos", "col")): _*)
      .select(col("id") +: carry.map(col) :+
        col("col.band").as("band") :+ col("col.bucket").as("bucket"): _*)
  }

  /** MinHash + LSH near-dup candidate pairs: signatures are cut into
    * `bands` bands of `rowsPerBand` hashes; documents sharing any band
    * value are candidates. Returns (id_a, id_b, estimated jaccard)
    * with id_a < id_b, deduplicated across bands. `maxBucket` caps
    * band-bucket size (see [[bandPairs]] — the boilerplate guard;
    * None = exact clique semantics, the oracle-replayed default).
    */
  def minhashLsh(docs: DataFrame, textCol: String, idCol: String,
                 shingleLen: Int = 5, bands: Int = 8,
                 rowsPerBand: Int = 4, maxDocLen: Int = 2000,
                 replayable: Boolean = false,
                 maxBucket: Option[Int] = None,
                 scope: CacheScope = CacheScope.global): DataFrame = {
    val k = bands * rowsPerBand
    // signatures are consumed three times (banding + both sides of the
    // pair re-join); materialize once. The signature itself is ONE
    // native codegen'd pass per document (plans.MinhashSignature):
    // every code-point window's bytes are hashed in place with Spark's
    // XXH64 (bit-identical to xxhash64(substr)) and folded through k
    // affine mixes into running mins — no per-window row
    // materialization, no O(position) substring scans, no aggregate
    // shuffle. Affine family: splitmix64-derived odd multipliers (the
    // classic universal-hashing minhash family), Long arithmetic wraps
    // — any total order works for the min. Documents shorter than one
    // window get a null signature and are excluded, matching the
    // explode form where they produced no rows. Minhash is
    // duplicate-insensitive (min over a multiset), so no per-doc
    // shingle dedup is needed.
    val withSig = scope.persist(minhashSignatures(docs, textCol, idCol,
      shingleLen, bands, rowsPerBand, maxDocLen, replayable))
    // candidate pairs: same bucket in any band. Deduplicate to
    // DISTINCT (id_a, id_b) BEFORE touching the signatures — the band
    // join only ever shuffles (band, bucket, id) triples, and the
    // k-wide signature arrays are joined back exactly once per
    // surviving pair (a corpus with heavy band collisions would
    // otherwise re-compare signatures per colliding band).
    val banded0 = explodeBands(withSig, bands, rowsPerBand, replayable, Nil)
    // uncapped, banded is read twice (both join sides) — cheap
    // re-derivation from the cached signatures; capped it feeds the
    // size aggregate, the semi-join, the star join AND both clique
    // sides, so materialize the exploded form once
    val banded = if (maxBucket.isDefined) scope.persist(banded0) else banded0
    val pairs = bandPairs(banded, Seq("band", "bucket"), maxBucket).distinct()
    estJaccard(pairs, withSig, k)
  }

  /** Join signatures back onto distinct id pairs and score them. */
  private def estJaccard(pairs: DataFrame, sigs: DataFrame, k: Int): DataFrame =
    pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          c => c)).cast("double") / k).as("est_jaccard"))

  /** Incremental MinHash LSH — the daily-ingest dedup shape: score the
    * DELTA against itself and against the standing corpus WITHOUT
    * touching the corpus text. `baseSigs` is the persisted signature
    * store ((id, sig) — yesterday's [[minhashSignatures]] output plus
    * all prior deltas); only `delta` documents are read and hashed.
    * Emits exactly the [[minhashLsh]] pairs that involve at least one
    * delta document: delta-delta and delta-base; base-base pairs were
    * already resolved when the base was ingested.
    *
    * Scale: today's cost is |delta| signature passes + one band join
    * of the delta's band rows against the (stored) band index — at a
    * stable corpus growth rate that is O(delta) work per day instead
    * of O(corpus). `maxBucket` composes (over-cap buckets
    * star-collapse; pairs where both endpoints are base are dropped
    * after, same as the clique path).
    */
  def minhashLshDelta(baseSigs: DataFrame, delta: DataFrame,
                      textCol: String, idCol: String,
                      shingleLen: Int = 5, bands: Int = 8,
                      rowsPerBand: Int = 4, maxDocLen: Int = 2000,
                      replayable: Boolean = false,
                      maxBucket: Option[Int] = None,
                      scope: CacheScope = CacheScope.global): DataFrame = {
    val k = bands * rowsPerBand
    val deltaSigs = minhashSignatures(delta, textCol, idCol,
      shingleLen, bands, rowsPerBand, maxDocLen, replayable)
    val withSig = scope.persist(
      baseSigs.select(col("id"), col("sig"), lit(false).as("nw"))
        .unionByName(deltaSigs.select(col("id"), col("sig"),
          lit(true).as("nw"))))
    val banded = scope.persist(
      explodeBands(withSig, bands, rowsPerBand, replayable, Seq("nw")))
    val keys = Seq("band", "bucket")
    val kc = keys.map(col)
    // delta-oriented join: one side is the DELTA's band rows only, so
    // candidate work is proportional to delta-touching pairs — a
    // symmetric self-join followed by an nw filter would still compute
    // every base-base candidate first
    def deltaPairs(all: DataFrame): DataFrame = {
      val x = all.select(kc :+ col("id").as("id_x"): _*)
      val y = all.filter(col("nw")).select(kc :+ col("id").as("id_y"): _*)
      x.join(y, keys).filter(col("id_x") =!= col("id_y"))
        .select(least(col("id_x"), col("id_y")).as("id_a"),
          greatest(col("id_x"), col("id_y")).as("id_b"))
    }
    val pairs = (maxBucket match {
      case None => deltaPairs(banded)
      case Some(cap) =>
        require(cap >= 2, "maxBucket must be >= 2")
        // bucket sizes over the FULL bucket (base + delta), so the
        // cap and the hub match the batch [[minhashLsh]] semantics
        val sizes = banded.groupBy(kc: _*)
          .agg(count(lit(1)).as("__n"), min(col("id")).as("__hub"),
            min_by(col("nw"), col("id")).as("__hub_nw"))
        val small = banded.join(
          sizes.filter(col("__n") <= cap).select(kc: _*), keys, "left_semi")
        val star = banded.join(sizes.filter(col("__n") > cap), keys)
          .filter(col("id") =!= col("__hub") &&
            (col("nw") || col("__hub_nw")))
          .select(col("__hub").as("id_a"), col("id").as("id_b"))
        deltaPairs(small).unionByName(star)
    }).distinct()
    estJaccard(pairs, withSig, k)
  }

  /** SimHash over an already-materialized shingle-array column:
    * per-bit weighted majority of shingle hashes, 64-bit fingerprint.
    * Near-dups = fingerprints within a small Hamming distance
    * (joinable by banding the bits). The input MUST be an attribute —
    * 64 per-bit aggregates each re-evaluate a composed expression
    * (see TextFunctions.charShinglesFrom).
    *
    * `private[graft]`: this HOF form is the REFERENCE implementation
    * the spec cross-checks [[simhashBulk]]'s native kernel against —
    * lambdas are CodegenFallback (64 interpreted passes per document),
    * so it must never be a production path. Use [[simhashBulk]].
    */
  private[graft] def simhashFrom(sh: Column): Column = {
    val bits = (0 until 64).map { i =>
      val votes = aggregate(sh, lit(0),
        (acc, s) => acc + when(shiftright(hash(s).cast("long"), i % 32)
          .bitwiseAND(1L) === 1L, 1).otherwise(-1))
      when(votes > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Convenience one-shot form for the kernel cross-check spec only
    * (interpreted — see [[simhashFrom]]). */
  private[graft] def simhash(text: Column, shingleLen: Int = 2): Column =
    simhashFrom(T.wordShingles(text, shingleLen))

  /** Bulk SimHash: same fingerprint as [[simhashFrom]] (per-bit ±1
    * vote sums are order-free), computed by the native one-pass kernel
    * (plans.Simhash64): each shingle is murmur3-hashed once and its 64
    * bit votes accumulated in-register — no per-shingle row
    * materialization, no 64-accumulator aggregate shuffle, and the
    * whole scan stays inside whole-stage codegen. (The HOF form is
    * worse still: lambdas are CodegenFallback, interpreted per
    * element, 64 passes per document.)
    *
    * Input: (idCol, shingleArrayCol); output: (idCol, simhash).
    * Empty or null shingle arrays get fingerprint 0, same as the HOF
    * form (empty aggregate → all votes 0 → no bits set).
    */
  def simhashBulk(df: DataFrame, idCol: String, shingleCol: String,
                  replayable: Boolean = false): DataFrame =
    df.select(col(idCol),
      coalesce(graft.plans.TextExpressions.simhash64Fast(col(shingleCol),
        poly = replayable), lit(0L)).as("simhash"))

  /** SimHash near-duplicate pairs: documents whose 64-bit fingerprints
    * are within `maxHamming` bits. Pigeonhole banding: the fingerprint
    * is cut into `maxHamming + 1` bands, and two fingerprints within
    * distance k must agree EXACTLY on at least one band — so candidate
    * generation is an equi-join on (band, bits) and the exact
    * `bit_count(xor)` check runs per candidate only, never all-pairs.
    * Same scale shape as the MinHash band join: one shuffle on the
    * band key; a degenerate corpus (many identical fingerprints) is
    * bounded by the id-pair distinct before the Hamming check.
    */
  /** Pigeonhole band structs for a 64-bit fingerprint in column `f`:
    * `maxHamming + 1` slices — two fingerprints within `maxHamming`
    * bits must agree exactly on at least one slice.
    */
  private def simhashBandStructs(maxHamming: Int): Seq[Column] = {
    val bands = maxHamming + 1
    val width = 64 / bands
    (0 until bands).map { b =>
      val lo = b * width
      val w = if (b == bands - 1) 64 - lo else width
      val mask = if (w >= 64) -1L else (1L << w) - 1L
      struct(lit(b).as("band"),
        shiftright(col("f"), lo).bitwiseAND(lit(mask)).as("bits"))
    }
  }

  def simhashNearDup(fp: DataFrame, idCol: String, fpCol: String,
                     maxHamming: Int = 3,
                     maxBucket: Option[Int] = None,
                     scope: CacheScope = CacheScope.global): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming in [0, 63]")
    val bandStructs = simhashBandStructs(maxHamming)
    // persisted: both join sides reference it, and without the cache
    // each side would recompute the full fingerprint lineage
    val banded = scope.persist(fp.select(col(idCol).as("id"), col(fpCol).as("f"))
      .select(col("id"), col("f"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("f"), col("bb.band").as("band"), col("bb.bits").as("bits")))
    // over-cap star pairs (maxBucket set — degenerate fingerprint-heavy
    // corpora) weaken the pigeonhole guarantee from any-band-agreement
    // to hub-mediated: bucket members within maxHamming of the HUB
    // survive the exact check below; members near each other but far
    // from the hub are a bounded recall LOSS — their only candidate
    // edges are hub-mediated and the hamming filter removes those
    // before any cluster step (see [[bandPairs]] for the full
    // statement of the trade). Cap None = exact semantics.
    bandPairs(banded, Seq("band", "bits"), maxBucket, payload = Seq("f"))
      .distinct()
      .withColumn("hamming", bit_count(col("f_a").bitwiseXOR(col("f_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Incremental SimHash near-dup — [[minhashLshDelta]]'s sibling for
    * the fingerprint store: `baseFp` is the persisted (id, fp) table
    * (8 bytes per historical document), `deltaFp` today's new
    * fingerprints; emits exactly the [[simhashNearDup]] pairs that
    * involve at least one delta document. The band join's one side is
    * delta rows only — O(delta) candidate work against the standing
    * band index.
    */
  def simhashNearDupDelta(baseFp: DataFrame, deltaFp: DataFrame,
                          idCol: String, fpCol: String,
                          maxHamming: Int = 3,
                          scope: CacheScope = CacheScope.global): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming in [0, 63]")
    val bandStructs = simhashBandStructs(maxHamming)
    val all = baseFp.select(col(idCol).as("id"), col(fpCol).as("f"),
        lit(false).as("nw"))
      .unionByName(deltaFp.select(col(idCol).as("id"), col(fpCol).as("f"),
        lit(true).as("nw")))
    val banded = scope.persist(all
      .select(col("id"), col("f"), col("nw"),
        explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("f"), col("nw"),
        col("bb.band").as("band"), col("bb.bits").as("bits")))
    val keys = Seq("band", "bits")
    val kc = keys.map(col)
    val x = banded.select(kc ++ Seq(col("id").as("id_x"), col("f").as("f_x")): _*)
    val y = banded.filter(col("nw"))
      .select(kc ++ Seq(col("id").as("id_y"), col("f").as("f_y")): _*)
    x.join(y, keys).filter(col("id_x") =!= col("id_y"))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"),
        when(col("id_x") < col("id_y"), col("f_x")).otherwise(col("f_y")).as("f_a"),
        when(col("id_x") < col("id_y"), col("f_y")).otherwise(col("f_x")).as("f_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("f_a").bitwiseXOR(col("f_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** N-gram Jaccard similarity for candidate pairs sharing at least
    * one *rare* shingle: inverted-index join on shingle, document-
    * frequency pruning (`maxDf`) so ubiquitous grams never explode the
    * self-join — the standard guard for boilerplate-heavy corpora,
    * where one common gram would otherwise produce df² candidate
    * pairs. Returns pairs with similarity >= threshold, where
    * similarity is |rare-gram intersection| / |union| (a lower bound
    * on true Jaccard; exact when maxDf admits all grams).
    */
  def ngramJaccard(docs: DataFrame, textCol: String, idCol: String,
                   tokenize: Column => Column,
                   gramLen: Int = 3,
                   threshold: Double = 0.5,
                   maxDf: Option[Int] = Some(10),
                   maxDocLen: Int = 10000,
                   scope: CacheScope = CacheScope.global): DataFrame = {
    // the per-document distinct gram SET is computed by one native
    // pass (plans.DistinctWordGrams — windows joined and deduped
    // in-kernel, bit-identical to concat_ws over slices), so the set
    // size is just size(array) and the inverted index is a single
    // explode: no per-doc distinct shuffle, no sizes aggregate + join
    // Widen ONLY under-partitioned scan-shaped inputs (corpus parquet
    // compresses ~100:1 → byte-sized scans serialize the CPU-bound
    // gram build); see [[Width.widenIfNarrowScan]] for why a frame
    // with upstream shuffles is left alone.
    val wide = Width.widenIfNarrowScan(docs)
    val inv0 = wide
      .select(col(idCol).as("id"),
        graft.plans.TextExpressions.distinctWordGramsFast(
          tokenize(substring(col(textCol), 1, maxDocLen)), gramLen).as("garr"))
      .select(col("id"), size(col("garr")).as("n"),
        explode(col("garr")).as("gram"))
    val inv = scope.persist(maxDf match {
      case Some(df) =>
        val rare = inv0.groupBy("gram").agg(count(lit(1)).as("df"))
          .filter(col("df") <= df).select("gram")
        inv0.join(rare, "gram")
      case None => inv0
    }) // both sides of the pair self-join read it
    val a = inv.select(col("gram"), col("id").as("id_a"), col("n").as("n_a"))
    val b = inv.select(col("gram"), col("id").as("id_b"), col("n").as("n_b"))
    a.join(b, Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("sim",
        col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Directed n-gram CONTAINMENT for candidate pairs sharing a rare
    * shingle: cont(a→b) = |grams(a) ∩ grams(b)| / |grams(a)| — the
    * asymmetric cousin of [[ngramJaccard]] that catches a short
    * document embedded in a long one (quote farms, scraped excerpts,
    * prompt-in-completion leakage), which symmetric Jaccard dilutes
    * below any usable threshold. Same scale guards: one native
    * distinct-gram pass, df-pruned inverted index so no ubiquitous
    * gram explodes the self-join. Scores are integer milli
    * (1000·inter div n_a — engines replay them exactly); each
    * DIRECTION of a pair qualifies independently against the
    * threshold (a→b can pass while b→a does not).
    *
    * Like [[ngramJaccard]], the score is a LOWER BOUND when `maxDf`
    * prunes: the intersection counts only grams with df ≤ maxDf while
    * the denominator n_a counts ALL distinct grams of a — exact when
    * maxDf admits every gram (or is None).
    */
  def ngramContainment(docs: DataFrame, textCol: String, idCol: String,
                       tokenize: Column => Column,
                       gramLen: Int = 3,
                       thresholdMilli: Int = 500,
                       maxDf: Option[Int] = Some(10),
                       maxDocLen: Int = 10000,
                       scope: CacheScope = CacheScope.global): DataFrame = {
    val inv0 = docs
      .select(col(idCol).as("id"),
        graft.plans.TextExpressions.distinctWordGramsFast(
          tokenize(substring(col(textCol), 1, maxDocLen)), gramLen).as("garr"))
      .select(col("id"), size(col("garr")).as("n"),
        explode(col("garr")).as("gram"))
    val inv = scope.persist(maxDf match {
      case Some(df) =>
        val rare = inv0.groupBy("gram").agg(count(lit(1)).as("df"))
          .filter(col("df") <= df).select("gram")
        inv0.join(rare, "gram")
      case None => inv0
    })
    val a = inv.select(col("gram"), col("id").as("id_a"), col("n").as("n_a"))
    val b = inv.select(col("gram"), col("id").as("id_b"))
    a.join(b, Seq("gram"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy("id_a", "id_b", "n_a")
      .agg(count(lit(1)).as("inter"))
      .withColumn("cont_milli", expr("1000 * inter div n_a"))
      .filter(col("cont_milli") >= thresholdMilli)
      .select("id_a", "id_b", "cont_milli")
  }

  /** Corpus-level dedup resolution: near-dup PAIRS (from any of the
    * pair generators here) → connected components over the pair graph
    * → one canonical document per cluster (lowest id) with the cluster
    * size. Documents that appear in no pair are their own canonical
    * and are not emitted. `iterations` bounds the propagation depth:
    * a chain of near-dups longer than `iterations` hops resolves into
    * more than one cluster — dup chains are short in practice, and a
    * fixed depth keeps the computation deterministic and replayable.
    */
  def dedupClusters(pairs: DataFrame, iterations: Int = 3,
                    converge: Boolean = false,
                    scope: CacheScope = CacheScope.global): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    val comps =
      if (converge)
        // production path: iterate to fixpoint so a dup chain longer
        // than the fixed depth can't silently split into several
        // clusters (= under-dedup); `iterations` is the runaway bound
        GraphOps.connectedComponentsConverged(edges, math.max(iterations, 50), scope)
      else GraphOps.connectedComponents(edges, iterations, scope)
    comps
      .groupBy(col("comp"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("cluster_size"))
      .select("comp", "keep_id", "cluster_size")
  }

  /** Embedding-cosine near-duplicate pairs, LSH-bucketed: vectors
    * sharing a hyperplane-signature bucket are compared exactly;
    * pairs with cosine >= threshold survive.
    *
    * Signature + vector norm are computed in ONE pass: posexplode the
    * vector, then a single codegen'd hash aggregate with `planes`
    * projection sums and a squared-norm sum. The per-plane
    * higher-order form ([[VectorFunctions.hyperplaneSig]]) makes
    * `planes` interpreted passes over every vector (HOF lambdas are
    * CodegenFallback); this form reads each element once. The
    * explode keeps a vector's elements in array order inside one
    * partition, so the IEEE float sums are bit-identical to the HOF
    * form. Norms are hoisted out of the pair stage — cosine per
    * candidate pair is just dot/(norm_a*norm_b) instead of
    * recomputing both norms per pair.
    */
  def embeddingNearDup(emb: DataFrame, vecCol: String, idCol: String,
                       planes: Int = 12, threshold: Double = 0.95,
                       replayable: Boolean = false,
                       scope: CacheScope = CacheScope.global): DataFrame = {
    // bucket + norm in ONE native pass per vector
    // (plans.HyperplaneSig — same pseudo-weight stream as
    // VectorFunctions.hyperplaneSig, bit-identical accumulation order
    // to the posexplode + aggregate form it replaces): no per-element
    // row materialization and no aggregate shuffle keyed by the full
    // vector. Empty vectors get a null signature and are excluded,
    // matching the explode form where they produced no rows. The
    // replayable (polynomial) family has no seed by construction —
    // hence the separate entry point rather than a seed that would be
    // silently ignored.
    val sigCol =
      if (replayable)
        graft.plans.VectorExpressions.hyperplaneSigReplayable(col(vecCol), planes)
      else
        graft.plans.VectorExpressions.hyperplaneSigFast(col(vecCol), planes, seed = 42)
    val sig = scope.persist(emb.select(col(idCol).as("id"), col(vecCol).as("v"),
        sigCol.as("s"))
      .filter(col("s").isNotNull)
      .select(col("id"), col("v"),
        col("s").getField("bucket").as("bucket"),
        col("s").getField("nrm").as("nrm")))
    val a = sig.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val b = sig.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", when(col("n_a") > 0.0 && col("n_b") > 0.0,
        V.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
      .groupBy("id_a", "id_b")
      .agg(first("cos").as("cos"))
  }

  /** Semantic near-dup pairs, SemDeDup-style (cluster-scoped pairing):
    * candidate pairs are generated WITHIN k-means cells (the
    * `indexed = (id, v, cell)` frame from [[Similarity.ivfKMeans]])
    * instead of LSH buckets — the curation variant that reuses the
    * embedding-store clustering the search index already maintains.
    * Returns (cell, id_a, id_b, cos) for pairs at or above
    * `threshold`; pairs split across cells are missed by construction
    * (the method's documented recall trade — [[embeddingNearDup]] is
    * the LSH alternative when that matters).
    *
    * Scale: the self-join is keyed by cell — each cell's block is
    * |cell|^2/2 candidate cosines, so cell count is the knob that
    * bounds quadratic work, and oversized cells are exactly what AQE
    * skew-split partitions further.
    */
  def semanticNearDup(indexed: DataFrame, threshold: Double): DataFrame = {
    val a = indexed.select(col("cell"), col("id").as("id_a"), col("v").as("v_a"))
    val b = indexed.select(col("cell"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        graft.plans.VectorExpressions.cosineFast(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("cell"), col("id_a"), col("id_b"), col("cos"))
  }

  /** Sub-document (span-level) duplication profile: chop each document
    * into non-overlapping `span`-word chunks and measure, per document,
    * what fraction of its chunks also appear verbatim in at least one
    * OTHER document. The RefinedWeb/Dolma-style signal for boilerplate
    * (headers, license blocks, navigation) that document-level dedup
    * cannot see — a curation pass drops or trims documents above a
    * duplicated-span threshold. Returns
    * (doc_id, n_spans, dup_spans, dup_frac); documents shorter than
    * one span are excluded (no chunks to profile).
    *
    * Scale design: the explode is bounded at rows x words/span (span
    * chunks, not sliding shingles — 1/span of the shingle blowup); the
    * cross-corpus count is `count_distinct(doc)` per span — a
    * partial-aggregating shuffle keyed by span text, with the hot
    * boilerplate spans exactly the keys AQE skew handling splits; the
    * rejoin carries only spans seen in >= 2 documents.
    */
  def spanDupStats(docs: DataFrame, textCol: String, idCol: String,
                   span: Int = 8): DataFrame = {
    require(span > 0, "span must be positive")
    val spans = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol).as("doc_id"),
        split(trim(col(textCol)), "\\s+").as("ws"))
      .withColumn("ns", expr(s"size(ws) div $span"))
      .filter(col("ns") >= 1)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, ns - 1), i -> concat_ws(' ', slice(ws, i * $span + 1, $span)))"))
        .as("span"))
    val dup = spans.groupBy(col("span"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("span"), lit(true).as("is_dup"))
    spans.join(dup, Seq("span"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_spans"),
        count(col("is_dup")).cast("int").as("dup_spans"))
      .withColumn("dup_frac",
        col("dup_spans").cast("double") / col("n_spans"))
  }

  /** Blocked fuzzy (edit-distance) join: emit (dirty row, clean row,
    * dist) for every pair with levenshtein ≤ `maxDist`, WITHOUT the
    * theta join a naive `ON levenshtein(a,b) <= d` plans (a broadcast
    * nested loop — |dirty|·|clean| distance evaluations, the one plan
    * shape that cannot survive a 100× scale-up).
    *
    * Standard record-linkage blocking, as an EQUI-join:
    *   - block key = (first char, last char, length band) where band =
    *     len / (maxDist+1). Two strings within distance d differ in
    *     length by ≤ d, so their bands differ by ≤ 1; the PROBE side
    *     (dirty) explodes bands {b−1, b, b+1} while the build side
    *     keeps its single band — every in-band pair meets on EXACTLY
    *     one key (no post-join dedup). The edge characters matter on
    *     SHORT-string corpora (part names: 7–12 chars, 8 first
    *     letters): first-char+band alone left 16 blocks and 50M
    *     candidate pairs at sf0.1; adding the last char cuts that to
    *     7.8M — blocking keys must carry enough entropy for the data,
    *     and edge chars are the cheapest edit-stable signal.
    *   - levenshtein ≤ d runs as the per-candidate RESIDUAL filter —
    *     in its THRESHOLDED form (`levenshtein(a, b, d)`), which runs
    *     the banded O((2d+1)·n) DP with early exit and returns −1 over
    *     the threshold, instead of the full O(n²) matrix; with an
    *     `|len(a) − len(b)| ≤ d` pre-guard first (adjacent bands admit
    *     length gaps up to 2·(d+1)−1, and a length gap > d can never
    *     pass). Same result set as the unbounded form — measured 52 s
    *     → ~3 s on the 20k-name part-table query at sf0.1.
    *
    * Recall: length banding is exact (no pair within d is band-split);
    * edge-char blocking is the standard heuristic trade — a pair whose
    * edit touches the first OR last character is lost. The recall dial
    * is multi-key union (run with several independent key families —
    * e.g. edge-chars and rarest-q-gram — and union the candidates);
    * this operator ships the single family, documented, deterministic,
    * and mirrored verbatim in the SQL oracle.
    *
    * Inputs must have disjoint column names. Output = dirty columns ++
    * clean columns ++ `dist` (int).
    */
  def fuzzyJoinBlocked(dirty: DataFrame, dirtyName: String,
                       clean: DataFrame, cleanName: String,
                       maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    val w = maxDist + 1
    def key(name: Column, band: Column): Column =
      concat(substring(name, 1, 1), substring(name, -1, 1),
        lit("|"), band.cast("string"))
    val build = clean.withColumn("__bk",
      key(col(cleanName), floor(length(col(cleanName)) / w).cast("long")))
    val probe = dirty
      .withColumn("__b", floor(length(col(dirtyName)) / w).cast("long"))
      .withColumn("__bk", explode(array((-1 to 1).map(i =>
        key(col(dirtyName), col("__b") + i)): _*)))
      .drop("__b")
    // Pin the join's parallelism with an EXPLICIT-count repartition:
    // AQE coalesces post-shuffle partitions by BYTES, and this join's
    // output is small while its cost is CPU (a bounded levenshtein per
    // candidate pair) — measured 12.7 s in ONE coalesced task at
    // sf0.1, insensitive to core count. A user repartition-by-num is
    // never coalesced, so the candidate evaluation keeps full width.
    val n = dirty.sparkSession.sessionState.conf.numShufflePartitions
    probe.repartition(n, col("__bk")).join(build, "__bk")
      .filter(abs(length(col(dirtyName)) - length(col(cleanName))) <= maxDist)
      .withColumn("dist",
        levenshtein(col(dirtyName), col(cleanName), maxDist).cast("int"))
      .filter(col("dist") >= 0)
      .drop("__bk")
  }

  /** The RECALL DIAL [[fuzzyJoinBlocked]]'s scaladoc names: the
    * multi-key union family. Candidates are the union of TWO
    * independent blocking families, then deduped on the id pair:
    *
    *   - family A: (first char, last char, length band) — the single
    *     family fuzzyJoinBlocked ships; loses a pair whose edit
    *     touches an edge character.
    *   - family B: (rarest q-gram, length band) — each name blocks on
    *     its globally rarest q-gram (document frequency measured over
    *     the CLEAN side, min-(df, gram) tiebreak so the choice is
    *     deterministic). An edit touches at most q of a name's grams,
    *     so a pair whose edit misses the rare gram — including every
    *     edge-character edit on names longer than 2q — meets here.
    *
    * Neither family alone is exact; the union strictly grows recall
    * at bounded cost: family B adds two scans + one keyed aggregate
    * for the df table and its block key carries gram entropy, so
    * block sizes stay bounded by key-space density (same argument as
    * [[bandPairs]]). The final result is STILL threshold-exact per
    * candidate (the levenshtein residual runs on every candidate) —
    * the union only widens which pairs get tested.
    *
    * `dirtyId`/`cleanId` name unique id columns used to dedupe pairs
    * that both families catch. Output = fuzzyJoinBlocked's columns.
    *
    * TUNE q AND maxDf TO THE CORPUS. q must be long enough that the
    * rarest gram actually discriminates: on a template corpus built
    * from a small vocabulary (TPC-H part names: 5 words over 92
    * colors) NO 3-gram is rare — every gram's df is in the hundreds,
    * family B degenerates to a handful of giant blocks, and the
    * "recall dial" becomes an N² foot-gun (measured 34 s at sf0.1
    * before this guard). q=6 spans word BOUNDARIES there (df ≈ the
    * word-pair frequency ~10) and blocks stay key-space-bounded.
    * `maxDf` is the hard stop: grams with df > maxDf never become
    * block keys, so a name whose every gram is common simply has no
    * family-B key (family A still covers it) instead of joining a
    * mega-block. Both dials are mirrored in any oracle replay.
    */
  def fuzzyJoinBlockedMulti(dirty: DataFrame, dirtyName: String, dirtyId: String,
                            clean: DataFrame, cleanName: String, cleanId: String,
                            maxDist: Int, q: Int = 3,
                            maxDf: Option[Int] = None): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    require(q >= 2, "q-gram length must be >= 2")
    val w = maxDist + 1

    // distinct q-grams of a name column (whole name when shorter
    // than q); takes the column NAME because the gram positions are
    // generated via a lambda expr
    def grams(name: String): Column = array_distinct(
      when(length(col(name)) < q, array(col(name))).otherwise(
        expr(s"transform(sequence(1, length($name) - ${q - 1}), " +
          s"i -> substring($name, i, $q))")))

    // df table over the clean side; rarest CORPUS-KNOWN gram per name
    // on both sides. The join is INNER on purpose: a gram the clean
    // corpus never saw (e.g. the one a typo just created) must not
    // win "rarest" — both sides must prefer shared evidence, or the
    // perturbed side would always block on its own typo and never
    // meet its partner. A name with no known gram simply has no
    // family-B key (family A still covers it).
    val df0 = clean.select(explode(grams(cleanName)).as("__g"))
      .groupBy("__g").agg(count(lit(1)).as("__df"))
    val df = maxDf.map(d => df0.filter(col("__df") <= d)).getOrElse(df0)
    def withRarest(side: DataFrame, nameCol: String): DataFrame = {
      val exploded = side.select(col(nameCol).as("__n"))
        .distinct()
        .select(col("__n"), explode(grams("__n")).as("__g"))
        .join(df, Seq("__g"))
      val rarest = exploded.groupBy("__n")
        .agg(min_by(col("__g"), struct(col("__df"), col("__g"))).as("__rg"))
      side.join(rarest, side(nameCol) === rarest("__n")).drop("__n")
    }

    def key(g: Column, band: Column): Column =
      concat(g, lit("|"), band.cast("string"))
    val build = withRarest(clean, cleanName).withColumn("__bk",
      key(col("__rg"), floor(length(col(cleanName)) / w).cast("long")))
      .drop("__rg")
    val probe = withRarest(dirty, dirtyName)
      .withColumn("__b", floor(length(col(dirtyName)) / w).cast("long"))
      .withColumn("__bk", explode(array((-1 to 1).map(i =>
        key(col("__rg"), col("__b") + i)): _*)))
      .drop("__b", "__rg")
    val famB = probe.join(build, "__bk")
      .filter(abs(length(col(dirtyName)) - length(col(cleanName))) <= maxDist)
      .withColumn("dist",
        levenshtein(col(dirtyName), col(cleanName), maxDist).cast("int"))
      .filter(col("dist") >= 0)
      .drop("__bk")

    fuzzyJoinBlocked(dirty, dirtyName, clean, cleanName, maxDist)
      .unionByName(famB)
      .dropDuplicates(dirtyId, cleanId)
  }

  /** SOFT deduplication (the SemDeDup/D4-era alternative to dropping
    * copies): every member of an exact-duplicate cluster SURVIVES,
    * but with sampling weight 1/cluster_size, so k copies of a
    * document contribute one document's worth of expected training
    * mass — repetition is downweighted without losing the unique
    * tail of near-boilerplate variants. Emits each row with its
    * cluster size, `weight_bp = 10000 div m` (the basis-point keep
    * rate), and the deterministic keep decision
    * `detHash2(ord) % 10000 < weight_bp` — so downstream can either
    * weight (use weight_bp) or thin (use kept) with one pass, and
    * both replay exactly in any engine.
    *
    * Scale shape: ONE count aggregate on the cluster key + ONE
    * equi-join of the rows against the (key, size) table — both
    * shuffle on the same key, and AQE collapses the pair into a
    * single exchange. No window, no all-pairs; the cluster-size
    * table is duplicate-groups-sized.
    */
  def softDedupWeights(docs: DataFrame, textCol: String,
                       idCol: String): DataFrame = {
    val key = sha2(regexp_replace(lower(trim(col(textCol))), "\\s+", " "), 256)
    val sized = docs.withColumn("__k", key)
    val clusters = sized.groupBy(col("__k"))
      .agg(count(lit(1)).as("cluster_n"))
    sized.join(clusters, "__k")
      .withColumn("weight_bp", expr("10000L div cluster_n"))
      .withColumn("kept",
        Sampling.detHash2(col(idCol)) % 10000L < col("weight_bp"))
      .drop("__k")
  }
}
