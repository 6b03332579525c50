package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication suite for large-scale training-data pipelines.
  *
  * Scale design notes (the 100 TB shapes):
  *  - exact dedup: one hash-groupBy shuffle keyed on a digest, never on the
  *    full text (shuffle payload = digest + id, not documents);
  *  - minhash LSH: candidate generation never compares all pairs — docs
  *    shuffle once per band (b small), buckets join only within band keys;
  *    the quadratic step is confined to same-bucket groups, and a bucket-size
  *    cap bounds the worst case (degenerate mega-buckets are dropped —
  *    standard LSH practice);
  *  - simhash: signature is one int64 per doc; near-dup candidates via
  *    banded chunks of the signature, verified by hamming distance;
  *  - verification joins re-fetch only candidate-pair payloads by id.
  */
object Dedup {

  /** Memoize an expensive per-doc prep frame that downstream self-joins and
    * payload re-fetches would otherwise recompute 3-4×. MEMORY_AND_DISK
    * persist keeps lineage intact (an executor loss recomputes the lost
    * partitions — unlike localCheckpoint, which kills the job on a real
    * cluster); the caching effect is identical in-session.
    *
    * Every frame persisted here is tracked so long-lived sessions (a bench
    * loop running 50+ queries) can bound cache growth with [[releaseCache]]
    * instead of waiting for the GC-driven ContextCleaner.
    */
  private val cachedPreps = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private def materialize(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cachedPreps += p
    p
  }

  /** Unpersist every prep frame cached by the pair generators so far. Call
    * after the pair DataFrame has been materialized (written / collected) —
    * the lazily-returned pair frames hold the persist for correctness of
    * their multiple scans, so the caller owns the release point.
    */
  def releaseCache(): Unit = synchronized {
    cachedPreps.foreach(_.unpersist(false))
    cachedPreps.clear()
  }

  /** Exact dedup: keep the row with the smallest `idCol` per distinct
    * `textCol`. Digest-keyed shuffle; returns kept ids + group sizes.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Resolve near-dup pairs into clusters — the step every production dedup
    * pipeline needs after pair generation: connected components over the
    * pair graph, labeling each doc with the SMALLEST id in its component
    * (the canonical keeper; `keep = id == cluster_id`).
    *
    * Algorithm: iterative min-label propagation with pointer jumping. Each
    * round (a) every node takes the min of its own label and its neighbors'
    * labels (one equi-join + groupBy), then (b) labels compress one pointer
    * hop (label := label(label)). Converges in O(log n) rounds on typical
    * dup graphs (pointer jumping halves chain lengths); each round is a
    * constant number of hash shuffles on (id, label) pairs — never the
    * payloads — so the op scales to billion-edge pair sets.
    */
  /** @param driverFinishEdges hybrid BSP/driver finish bound: once a round
    *   relabels few nodes, the remaining ACTIVE subgraph (cross-label edges
    *   + label chains) is usually tiny even when the full graph has
    *   billions of edges — the classic long-tail of distributed CC, where
    *   each extra round is pure job latency. When the active subgraph fits
    *   within this many label pairs it is collected, closed with a driver
    *   union-find (min root, matching the distributed semantics), and
    *   broadcast back — replacing the last O(log chain) rounds with two
    *   jobs. 50k pairs ≈ ~2 MB broadcast: safe on any driver. 0 disables
    *   (pure BSP; spec-proven equivalent).
    */
  def resolveClusters(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxRounds: Int = 30,
      driverFinishEdges: Int = 50000
  ): DataFrame = {
    // Iterative self-referential plans MUST truncate lineage each round or
    // the logical plan doubles per iteration (the pointer jump references
    // the previous round twice) and analysis alone OOMs the driver. Reliable
    // checkpoint when a checkpoint dir is configured (the cluster setup —
    // survives executor loss, GraphX-style); localCheckpoint otherwise.
    val sc = pairs.sparkSession.sparkContext
    val reliableOk = sc.getCheckpointDir.isDefined
    // Checkpoint policy: localCheckpoint truncates lineage in ONE job per
    // round (block store, no write job); a RELIABLE checkpoint costs a
    // second job that re-materializes the round to stable storage, so it is
    // paid only every `reliableEvery` rounds. If a round later fails (an
    // executor holding localCheckpoint blocks died), the loop RESUMES from
    // the last reliable checkpoint instead of dying — bounded recompute on
    // a real cluster, near-zero overhead when nothing fails.
    val reliableEvery = 4
    def truncated(df: DataFrame, reliable: Boolean): DataFrame =
      if (reliable && reliableOk) df.checkpoint() else df.localCheckpoint()
    val edges = materialize(
      pairs.select(col(idA).as("a"), col(idB).as("b"))
        .unionByName(pairs.select(col(idB).as("a"), col(idA).as("b")))
        .distinct())
    var labels = truncated(
      edges.select(col("a").as("id")).distinct()
        .withColumn("label", col("id")), reliable = true)
    var lastReliable = labels
    var converged = false
    var round = 0
    var retries = 0
    var finishAttempts = 2 // stop probing if the active subgraph won't fit

    // Driver finish: collect the active label-connectivity subgraph —
    // (1) edges whose endpoints hold different labels, (2) labels that are
    // themselves relabeled (chains) — and close it with a min-root
    // union-find. Correct because min-propagation only ever assigns labels
    // from within a node's own component, the label graph preserves
    // component connectivity, and the true component minimum m always has
    // label m (nothing smaller exists to overwrite it). Comparable-based
    // min matches Spark's ordering for numeric and ASCII string ids.
    def tryDriverFinish(): Boolean = {
      val spark = pairs.sparkSession
      val la = labels.select(col("id").as("a"), col("label").as("la"))
      val lb = labels.select(col("id").as("b"), col("label").as("lb"))
      val cross = edges.join(la, Seq("a")).join(lb, Seq("b"))
        .where(col("la") =!= col("lb")).select(col("la"), col("lb"))
      val chains = labels
        .join(labels.select(col("id").as("label"), col("label").as("lb")),
          Seq("label"))
        .where(col("label") =!= col("lb"))
        .select(col("label").as("la"), col("lb"))
      val active = cross.unionByName(chains).distinct()
        .limit(driverFinishEdges + 1).collect()
      if (active.length > driverFinishEdges) { finishAttempts -= 1; return false }
      def less(x: Any, y: Any): Boolean =
        x.asInstanceOf[Comparable[Any]].compareTo(y) < 0
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      active.foreach { e =>
        val (rx, ry) = (find(e.get(0)), find(e.get(1)))
        if (rx != ry) {
          if (less(rx, ry)) parent(ry) = rx else parent(rx) = ry
        }
      }
      val corr = parent.keys.toSeq.map(l => (l, find(l)))
        .filter { case (l, r) => l != r }
        .map { case (l, r) => org.apache.spark.sql.Row(l, r) }
      if (sys.env.contains("GRAFT_DEBUG_CC"))
        System.err.println(
          s"[cc] driver finish: active=${active.length} corrections=${corr.size}")
      if (corr.isEmpty) return true // chains already closed — nothing to fix
      val dt = labels.schema("label").dataType
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("label", dt),
        org.apache.spark.sql.types.StructField("__root", dt)))
      val corrDf = spark.createDataFrame(
        spark.sparkContext.parallelize(corr, 1), schema)
      labels = truncated(
        labels.join(broadcast(corrDf), Seq("label"), "left")
          .select(col("id"),
            coalesce(col("__root"), col("label")).as("label")), reliable = true)
      true
    }
    while (!converged && round < maxRounds) {
      round += 1
      try {
        // (a) neighbor-min: every node takes min(own, neighbors') label
        val nbrMin = edges
          .join(labels.select(col("id").as("b"), col("label").as("nl")), Seq("b"))
          .groupBy(col("a").as("id")).agg(min(col("nl")).as("nbr_min"))
        val step = labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"), col("label").as("old_label"),
            least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        // (b) pointer jump (label := label(label)): every round, always.
        // Measured on the sf0.1 dup graph (long chains): skipping the jump
        // once movement slowed stretched convergence 8→16 rounds; a second
        // fresh jump replicates the un-materialized neighbor-min subtree 4×
        // in the plan and tripled wall time; hops through the previous
        // round's materialized labels don't contract (the fresh jump
        // already lands on near-roots). One jump per round is the optimum
        // under one-materialization-per-round.
        val next =
          step.join(step.select(col("id").as("label"), col("label").as("ll")),
            Seq("label"), "left")
            .select(col("id"), col("old_label"),
              coalesce(col("ll"), col("label")).as("label"))
        // ONE action per round: the checkpoint job both materializes the
        // new labels and (via observe) counts how many changed — type-
        // agnostic (string/UUID ids work; no numeric cast) and exact, so
        // the fixpoint test is `changed == 0` with no second pass
        val obs = org.apache.spark.sql.Observation()
        val reliableRound = round % reliableEvery == 0
        val jumped = truncated(
          next.observe(obs,
            sum(when(col("label") === col("old_label"), 0L).otherwise(1L))
              .as("changed"))
            .select(col("id"), col("label")), reliableRound)
        val m = obs.get
        val changed = Option(m("changed")).fold(0L)(_.asInstanceOf[Long])
        converged = changed == 0L
        if (sys.env.contains("GRAFT_DEBUG_CC"))
          System.err.println(s"[cc] round=$round changed=$changed")
        labels = jumped
        if (reliableRound) lastReliable = jumped
        // the relabel count is the cheap proxy for a small active frontier
        if (!converged && driverFinishEdges > 0 && finishAttempts > 0 &&
            changed <= driverFinishEdges)
          converged = tryDriverFinish()
      } catch {
        case e: org.apache.spark.SparkException =>
          retries += 1
          if (retries > 3) throw e
          // lost localCheckpoint blocks (executor death): rewind to the
          // last reliable checkpoint and redo at most reliableEvery-1
          // rounds. The failed round did no propagation work, so it must
          // not consume the convergence budget (otherwise a few failures
          // could exhaust maxRounds on a graph that needs them).
          round -= 1
          labels = lastReliable
          converged = false
      }
    }
    edges.unpersist()
    // Returning partially-propagated labels would silently treat members of
    // one dup cluster as distinct docs downstream (dedupDocs keep-list) —
    // fail loudly instead. maxRounds bounds ROUNDS, not correctness:
    // pointer-jumped min-label propagation converges in O(log n) rounds, so
    // hitting 30 means a pathological graph that needs operator attention.
    if (!converged)
      throw new IllegalStateException(
        s"resolveClusters did not converge within $maxRounds rounds — " +
          "raise maxRounds (labels would be partially merged)")
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Candidate near-dup pairs via MinHash + LSH banding, verified with the
    * exact n-gram Jaccard of the pair. Returns (id_a, id_b, jaccard) with
    * id_a < id_b and jaccard >= threshold.
    *
    * @param blockCap drop degenerate buckets with more than this many docs
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 8,
      bands: Int = 4,
      threshold: Double = 0.35,
      blockCap: Int = 64
  ): DataFrame = {
    val rows = numHashes / bands
    val withSig = df.select(
      col(idCol).as("id"),
      array_sort(TextHash.shingleHashes(col(textCol), shingleN)).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("bkeys", TextHash.bandKeys(
        TextHash.minhashSig(col("sh"), numHashes), bands, rows))
      // materialize the per-doc prep once: the self-join + payload re-fetch
      // would otherwise recompute shingling/minhashing 4x (the operator-level
      // analog of the reference's lru_cache memoization, ugs.py:265)
      .transform(materialize)
    val buckets = withSig
      .select(col("id"), col("sh"), explode(col("bkeys")).as("bkey"))
    // prune degenerate buckets before the quadratic step
    val capped = buckets
      .withColumn("bsize", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bkey"))))
      .where(col("bsize") <= blockCap)
      .drop("bsize")
    // candidate generation carries only (bkey, id, size) — the shingle
    // arrays are re-fetched by id for the (much smaller) verified pair set
    val slim = capped.select(col("bkey"), col("id"), size(col("sh")).as("sz"))
    val a = slim.select(col("bkey"), col("id").as("id_a"), col("sz").as("sz_a"))
    val b = slim.select(col("bkey"), col("id").as("id_b"), col("sz").as("sz_b"))
    // exact size-ratio pruning (J >= t implies min >= t*max) before any
    // payload is touched; the join stays a pure equi hash join on band key
    val sizeOk = least(col("sz_a"), col("sz_b")).cast("double") >=
      lit(threshold) * greatest(col("sz_a"), col("sz_b")).cast("double")
    val cand = a.join(b, Seq("bkey"))
      .where(col("id_a") < col("id_b") && sizeOk)
      .select(col("id_a"), col("id_b"))
      .distinct()
    val pa = withSig.select(col("id").as("id_a"), col("sh").as("sh_a"),
      size(col("sh")).as("sz_a"))
    val pb = withSig.select(col("id").as("id_b"), col("sh").as("sh_b"),
      size(col("sh")).as("sz_b"))
    cand.join(pa, Seq("id_a")).join(pb, Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"),
        graft.functions.SortedIntersectCount(col("sh_a"), col("sh_b"))
          .cast("double").as("inter"))
      .select(col("id_a"), col("id_b"),
        (col("inter") / (col("sz_a") + col("sz_b") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** End-to-end document dedup: exact duplicates (same text digest) and
    * near-duplicates (exact n-gram Jaccard ≥ threshold via the PPJoin path)
    * are merged into clusters and only each cluster's smallest id survives.
    * Returns the KEPT ids — the materialized keep-list a training-data
    * pipeline feeds downstream.
    *
    * Composition, all at the scale shapes documented on the pieces:
    * digest-groupBy for exact edges, prefix-filtered similarity join for
    * near edges, [[resolveClusters]] for the transitive closure.
    */
  def dedupDocs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockKey: org.apache.spark.sql.Column,
      shingleN: Int = 3,
      threshold: Double = 0.7
  ): DataFrame = {
    // ONE scan of the raw documents feeds both edge generators: the md5
    // digest (exact edges, all docs incl. shingle-less short ones) and the
    // shingle sets (near edges) are computed side by side and cached once
    val shared = materialize(df.select(
      col(idCol).as("id"), blockKey.as("blk"),
      array_sort(TextHash.shingleHashes(col(textCol), shingleN)).as("sh"),
      md5(col(textCol)).as("__md5"))
      .withColumn("sz", size(col("sh"))))
    val keepers = shared.withColumn("__keeper",
      min(col("id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__md5"))))
    val exactEdges = keepers.where(col("id") =!= col("__keeper"))
      .select(col("__keeper").as("id_a"), col("id").as("id_b"))
    val nearEdges = jaccardFromPrepped(
      shared.where(col("sz") > 0).select(col("id"), col("blk"), col("sh"), col("sz")),
      threshold)
      .select(col("id_a"), col("id_b"))
    val clusters = resolveClusters(exactEdges.unionByName(nearEdges))
    df.select(col(idCol))
      .join(clusters.where(col("id") =!= col("cluster_id"))
        .select(col("id").as(idCol)), Seq(idCol), "left_anti")
  }

  /** Incremental dedup — the daily-ingest production shape: admit only the
    * documents of a NEW batch that are neither exact nor near duplicates
    * (n-gram Jaccard ≥ threshold) of the EXISTING corpus, nor of a batch
    * sibling. The corpus is never re-deduped (its keep decisions are
    * final) and never self-joined — each call costs one batch-vs-corpus
    * prefix-filtered similarity join ([[contaminationPairs]]) plus a
    * batch-internal [[dedupDocs]], both bounded by batch size, so daily
    * ingest stays O(batch · corpus-index), not O(corpus²).
    * Returns the admitted batch ids (one `idCol` column).
    */
  def dedupIncremental(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      blockKey: org.apache.spark.sql.Column,
      shingleN: Int = 3,
      threshold: Double = 0.7
  ): DataFrame = {
    // exact collisions with the corpus: digest semi-join (never the text)
    val bMd5 = batch.select(col(idCol).as("id"), md5(col(textCol)).as("__md5"))
    val cMd5 = corpus.select(md5(col(textCol)).as("__md5")).distinct()
    val exactHit = bMd5.join(cMd5, Seq("__md5"), "left_semi").select(col("id"))
    // near collisions with the corpus: cross-table prefix-filtered jaccard
    val nearHit = contaminationPairs(corpus, idCol, batch, idCol, textCol,
        blockKey, shingleN, threshold)
      .select(col("bench_id").as("id")).distinct()
    // batch-internal keep-list (exact ∪ near clusters, min id kept)
    dedupDocs(batch, idCol, textCol, blockKey, shingleN, threshold)
      .join(exactHit.select(col("id").as(idCol)), Seq(idCol), "left_anti")
      .join(nearHit.select(col("id").as(idCol)), Seq(idCol), "left_anti")
  }

  /** SimHash near-dup pairs at production width: `words`×32-bit signatures
    * (default 64 bits), candidates = any shared 16-bit band (2·words
    * bands), verified by total hamming ≤ maxHamming.
    *
    * Recall is EXACT up to the block cap whenever maxHamming < 2·words: a
    * qualifying pair's ≤ maxHamming differing bits land in at most
    * maxHamming of the 2·words bands, so some band matches (pigeonhole) —
    * no qualifying pair is missed by banding itself. The round-3 16-bit
    * signature failed precisely here at scale: 2^16 distinct signatures
    * collapse into capped mega-buckets past ~10^7 docs; 64 bits keep
    * bucket sizes ~|corpus|/2^16 per band with real entropy per band key.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      blockCap: Int = 256,
      words: Int = 2
  ): DataFrame = {
    val sig = df.select(col(idCol).as("id"),
      TextHash.simhashParts(col(textCol), words).as("sig"))
    // 16-bit band slices of each part, tagged with the band index
    val bandExprs = (0 until words).flatMap { w =>
      val p = element_at(col("sig"), w + 1)
      Seq(concat(lit(s"${2 * w}:"), pmod(p, lit(65536L))),
        concat(lit(s"${2 * w + 1}:"), shiftright(p, 16)))
    }
    val banded = sig.select(col("id"), col("sig"),
      explode(array(bandExprs: _*)).as("bkey"))
    val capped = banded
      .withColumn("bsize", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bkey"))))
      .where(col("bsize") <= blockCap).drop("bsize")
    val a = capped.select(col("bkey"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = capped.select(col("bkey"), col("id").as("id_b"), col("sig").as("sig_b"))
    val hamming = (0 until words).map { w =>
      bit_count(element_at(col("sig_a"), w + 1)
        .bitwiseXOR(element_at(col("sig_b"), w + 1)))
    }.reduce(_ + _).cast("long")
    a.join(b, Seq("bkey"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming.as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact n-gram Jaccard pairs via a PPJoin-style prefix-filtered set-
    * similarity join (exact — identical output to the brute-force blocked
    * comparison, which is what the DuckDB oracle computes):
    *
    *  1. global shingle document-frequencies (one aggregation);
    *  2. each doc keeps only its PREFIX — the floor((1−t)·|A|)+1 globally
    *     rarest shingles: two sets with J ≥ t MUST share a prefix shingle
    *     (standard prefix-filtering theorem), so candidates are generated by
    *     an equi-join on prefix shingles only. Rare shingles → tiny fan-out;
    *     the quadratic blow-up of joining on common shingles never happens;
    *  3. exact size-ratio pruning (J ≥ t ⟹ min|A|,|B| ≥ t·max);
    *  4. only surviving candidate pairs re-fetch their full shingle sets
    *     (semi-join by id) and pay the O(|A|) intersection, computed once.
    *
    * At 100 TB this is the canonical shape: shuffles carry (shingle, id)
    * prefix pairs and candidate id-pairs — never the full sets per pair.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockKey: org.apache.spark.sql.Column,
      shingleN: Int = 3,
      threshold: Double = 0.3
  ): DataFrame = {
    val prepped = df.select(col(idCol).as("id"), blockKey.as("blk"),
      array_sort(TextHash.shingleHashes(col(textCol), shingleN)).as("sh"))
      .withColumn("sz", size(col("sh")))
      .where(col("sz") > 0)
      // materialized once: reused by the frequency pass, the prefix join
      // (both sides) and the verification payload re-fetch (both sides)
      .transform(materialize)
    jaccardFromPrepped(prepped, threshold)
  }

  /** PPJoin core over an already-prepped (id, blk, sh, sz) frame — shared by
    * [[ngramJaccardPairs]] and [[dedupDocs]] so the latter's one cached scan
    * feeds both its exact and near edge generators.
    */
  private def jaccardFromPrepped(
      prepped: DataFrame,
      threshold: Double
  ): DataFrame = {
    val long = prepped.select(col("id"), col("blk"), col("sz"),
      explode(col("sh")).as("shingle"))
    val freq = long.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df"), col("shingle"))
    val prefix = long.join(freq, Seq("shingle"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= floor(lit(1.0 - threshold) * col("sz")) + 1)
      .select(col("shingle"), col("blk"), col("id"), col("sz"))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.blk") === col("b.blk") &&
          col("a.id") < col("b.id") &&
          least(col("a.sz"), col("b.sz")).cast("double") >=
          lit(threshold) * greatest(col("a.sz"), col("b.sz")).cast("double"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val pa = prepped.select(col("id").as("id_a"), col("sh").as("sh_a"),
      col("sz").as("sz_a"))
    val pb = prepped.select(col("id").as("id_b"), col("sh").as("sh_b"),
      col("sz").as("sz_b"))
    cand.join(pa, Seq("id_a")).join(pb, Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"),
        graft.functions.SortedIntersectCount(col("sh_a"), col("sh_b"))
          .cast("double").as("inter"))
      .select(col("id_a"), col("id_b"),
        (col("inter") / (col("sz_a") + col("sz_b") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Cross-table exact n-gram Jaccard — the CONTAMINATION CHECK of a
    * training pipeline: which benchmark/eval documents appear (exactly or
    * near-exactly) in the training corpus. Same PPJoin prefix-filtering
    * shape as [[ngramJaccardPairs]], generalized to two tables:
    *
    *  1. shingle document-frequencies over the UNION of both sides (the
    *     prefix theorem needs one consistent global rarity order);
    *  2. each side keeps its floor((1−t)·|A|)+1 rarest shingles; candidates
    *     come from the equi-join of the two prefix sets;
    *  3. exact size-ratio prune, then id-only candidates re-fetch payloads
    *     and pay one sorted-merge intersection per surviving pair.
    *
    * Returns (train_id, bench_id, jaccard ≥ threshold). At 100 TB the train
    * side never self-joins and only prefix rows shuffle.
    */
  def contaminationPairs(
      train: DataFrame,
      trainId: String,
      bench: DataFrame,
      benchId: String,
      textCol: String,
      blockKey: org.apache.spark.sql.Column,
      shingleN: Int = 3,
      threshold: Double = 0.8
  ): DataFrame = {
    def prep(df: DataFrame, id: String) = materialize(
      df.select(col(id).as("id"), blockKey.as("blk"),
        array_sort(TextHash.shingleHashes(col(textCol), shingleN)).as("sh"))
        .withColumn("sz", size(col("sh")))
        .where(col("sz") > 0))
    val tp = prep(train, trainId)
    val bp = prep(bench, benchId)
    def long(df: DataFrame) = df.select(col("id"), col("blk"), col("sz"),
      explode(col("sh")).as("shingle"))
    val freq = long(tp).unionByName(long(bp))
      .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    def prefix(df: DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("df"), col("shingle"))
      long(df).join(freq, Seq("shingle"))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= floor(lit(1.0 - threshold) * col("sz")) + 1)
        .select(col("shingle"), col("blk"), col("id"), col("sz"))
    }
    val cand = prefix(tp).as("a")
      .join(prefix(bp).as("b"),
        col("a.shingle") === col("b.shingle") && col("a.blk") === col("b.blk") &&
          least(col("a.sz"), col("b.sz")).cast("double") >=
          lit(threshold) * greatest(col("a.sz"), col("b.sz")).cast("double"))
      .select(col("a.id").as("train_id"), col("b.id").as("bench_id"))
      .distinct()
    val pa = tp.select(col("id").as("train_id"), col("sh").as("sh_a"),
      col("sz").as("sz_a"))
    val pb = bp.select(col("id").as("bench_id"), col("sh").as("sh_b"),
      col("sz").as("sz_b"))
    cand.join(pa, Seq("train_id")).join(pb, Seq("bench_id"))
      .select(col("train_id"), col("bench_id"), col("sz_a"), col("sz_b"),
        graft.functions.SortedIntersectCount(col("sh_a"), col("sh_b"))
          .cast("double").as("inter"))
      .select(col("train_id"), col("bench_id"),
        (col("inter") / (col("sz_a") + col("sz_b") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Embedding cosine near-dup pairs within LSH sign-buckets (see Ann). */
  def embeddingPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Int = 8,
      threshold: Double = 0.95,
      blockCap: Int = 1024
  ): DataFrame = {
    val v = graft.ann.Ann.toDouble(col(vecCol))
    val bucketed = df.select(col(idCol).as("id"), v.as("v"))
      .withColumn("bkey", graft.ann.Ann.signBucket(col("v"), planes))
    val capped = bucketed
      .withColumn("bsize", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bkey"))))
      .where(col("bsize") <= blockCap).drop("bsize")
    val a = capped.select(col("bkey"), col("id").as("id_a"), col("v").as("v_a"))
    val b = capped.select(col("bkey"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bkey"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.ann.Ann.cosine(col("v_a"), col("v_b")).as("cosine"))
      .where(col("cosine") >= threshold)
      .distinct()
  }
}
