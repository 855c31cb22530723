package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-group-level COPY_ON_WRITE — the upsert granularity that makes
  * COW viable at 100 TB, modeled on Hudi's record-key → file-group
  * index (the piece of the reference's DeltaStreamer runtime,
  * README.md:300-307, that [[Ingest]] commitMerge intentionally
  * simplifies away by rewriting the WHOLE snapshot per commit).
  *
  * The table is hash-bucketed on the record key into a fixed number of
  * file groups. A commit rewrites ONLY the buckets the batch's keys
  * hash into; every other bucket's data file is carried forward by
  * reference in a per-version manifest. At 100 TB with micro-batches
  * touching a tiny key fraction, the rewrite cost is ∝ dirty-bucket
  * bytes, not table bytes — the difference between minutes and a full
  * table rewrite per trigger. Reads resolve the ONE current manifest
  * (a single small driver-side file listing nBuckets paths — the
  * metadata-table role) and scan the referenced parquet dirs; no
  * directory walking on the hot path.
  *
  * Layout under `dir`:
  * {{{
  *   files/v<id>/_bucket=<b>/   parquet for bucket b rewritten at commit <id>
  *   manifest_v<id>.tsv         bucket → path + [min,max,count] key stats
  *   _COMMIT_<id>               marker (written LAST — commit point)
  * }}}
  *
  * Crash safety mirrors the COW protocol: data dirs first, manifest
  * second, atomic marker last; a crash anywhere leaves unreferenced
  * garbage, never a readable-but-wrong table. Replay idempotence by
  * batch id (a committed id is a no-op). GC retains the current and
  * prior manifest's references — same two-version retention window as
  * the COW/MOR services.
  *
  * The per-bucket key stats double as Hudi's bloom/column-stats index
  * role at bucket granularity: [[pointLookup]] prunes to the hash
  * bucket of each probed key AND drops buckets whose [min,max] range
  * excludes it — a point read touches 1 file group out of nBuckets.
  *
  * WRITER CONTRACT: one writer per table at a time (the Hudi/Delta-
  * without-a-lock-provider posture). The marker protocol makes any
  * single writer crash-safe and replays idempotent, and the cheap
  * stale-head rechecks here and in the SQL DML commands DETECT the
  * common concurrent-writer races (two statements racing one version,
  * a rollback landing mid-statement) and fail loudly — but detection
  * is not coordination: concurrent writers that interleave between a
  * recheck and its publish can still clobber each other. Serialize
  * writes per table; readers need no coordination (they resolve
  * whole committed manifests only).
  */
object FileGroups {

  private def fsOf(spark: SparkSession) =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def path(s: String) = new org.apache.hadoop.fs.Path(s)

  /** bucket of a key tuple: non-negative hash mod nBuckets. xxhash64 is
    * Spark-codegen'd and stable across sessions — the index must hash
    * identically forever or every historical bucket assignment breaks.
    * That stability is also TYPE-sensitive (xxhash64 of int 5 ≠ long
    * 5): batches must present key columns at the table's declared types,
    * which the ingest path guarantees by parsing against the declared
    * envelope schema (schema drift reconciles non-key columns only). */
  private def bucketCol(keys: Seq[String], nBuckets: Int) =
    pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong))

  private final case class Entry(bucket: Long, relPath: String,
                                 lo: Option[Long], hi: Option[Long], count: Long,
                                 bloom: Option[String] = None)

  /** Per-file-group key bloom filter — the Hudi BLOOM-index role
    * (the reference's DeltaStreamer default `hoodie.index.type`,
    * README.md:300-307 context): tag incoming keys insert-vs-update and
    * serve negative point probes WITHOUT touching data files. Fixed
    * geometry (4096 bits / 3 hashes ⇒ <0.1% FP at ~250 keys/group);
    * at 100 TB you size bits ∝ keys-per-file (Hudi's dynamic bloom) —
    * same math, per-entry `m` instead of a constant. The filter is
    * BUILT DISTRIBUTEDLY: explode k seeds per key, OR the bit words in
    * a (bucket, word) aggregation, and only the finished ≤ nBuckets ×
    * 64-word bitsets reach the driver (index metadata, not data). */
  private val BloomBits = 4096L
  private val BloomWords = (BloomBits / 64).toInt
  private val BloomK = 3

  /** Bit position of hash `seed` for a key — the SAME codegen'd
    * xxhash64 on writer and prober (driver-side reimplementation could
    * drift, exactly as [[bucketCol]]). */
  private def bloomPos(key: org.apache.spark.sql.Column, seed: Int) =
    pmod(xxhash64(key, lit(seed)), lit(BloomBits))

  /** hex(64 words) per bucket, from one narrow agg over the rewritten
    * buckets. Single-long-key tables only (same scope as the stats). */
  private def buildBlooms(out: DataFrame, key: String): Map[Long, String] = {
    val words = out
      .select(col("_bucket"), explode(array(
        (0 until BloomK).map(i => bloomPos(col(key), i)): _*)).as("pos"))
      .selectExpr("_bucket", "CAST(pos / 64 AS INT) AS w",
        "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)) AS m")
      .groupBy(col("_bucket"), col("w"))
      .agg(expr("bit_or(m)").as("bits"))
      .collect()
      .groupBy(_.getLong(0))
    words.map { case (b, rows) =>
      val arr = Array.fill(BloomWords)(0L)
      rows.foreach(r => arr(r.getInt(1)) = r.getLong(2))
      b -> arr.map(w => f"$w%016x").mkString
    }
  }

  private def bloomMightContain(hex: String, positions: Seq[Long]): Boolean =
    positions.forall { p =>
      val word = java.lang.Long.parseUnsignedLong(
        hex.substring((p / 64).toInt * 16, (p / 64).toInt * 16 + 16), 16)
      (word & (1L << (p % 64).toInt)) != 0L
    }

  private def manifestPath(dir: String, id: Long) = s"$dir/manifest_v$id.tsv"

  /** Current committed id (shares the `_COMMIT_<id>` convention). */
  def committedId(spark: SparkSession, dir: String): Option[Long] =
    Ingest.committedBatch(spark, dir)

  /** Manifest = `#nbuckets=` header, a `#schema=` header carrying the
    * table schema as Spark JSON (so an all-deleted table still reads as
    * a TYPED empty DataFrame, and [[pointLookup]] hashes probes at the
    * committed key type), then one tab-separated line per bucket. */
  private def readManifest(spark: SparkSession, dir: String, id: Long):
      (Int, Option[org.apache.spark.sql.types.StructType], Seq[Entry]) = {
    val fs = fsOf(spark)
    val in = fs.open(path(manifestPath(dir, id)))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val lines = text.split("\n").filter(_.nonEmpty)
    val headers = lines.takeWhile(_.startsWith("#"))
    val nBuckets = headers.collectFirst {
      case h if h.startsWith("#nbuckets=") => h.stripPrefix("#nbuckets=").toInt
    }.get
    val schema = headers.collectFirst {
      case h if h.startsWith("#schema=") =>
        org.apache.spark.sql.types.DataType.fromJson(h.stripPrefix("#schema="))
          .asInstanceOf[org.apache.spark.sql.types.StructType]
    }
    val entries = lines.drop(headers.length).toSeq.map { l =>
      val f = l.split("\t", -1)
      Entry(f(0).toLong, f(1), f(2).toLongOption, f(3).toLongOption, f(4).toLong,
        f.lift(5).filter(_.nonEmpty)) // bloom optional: pre-bloom manifests stay readable
    }
    (nBuckets, schema, entries)
  }

  private def writeManifest(spark: SparkSession, dir: String, id: Long, nBuckets: Int,
                            schema: org.apache.spark.sql.types.StructType,
                            entries: Seq[Entry]): Unit = {
    val body = s"#nbuckets=$nBuckets\n#schema=${schema.json}\n" +
      entries.sortBy(_.bucket).map { e =>
        s"${e.bucket}\t${e.relPath}\t${e.lo.fold("")(_.toString)}\t${e.hi.fold("")(_.toString)}\t${e.count}\t${e.bloom.getOrElse("")}"
      }.mkString("\n")
    val out = fsOf(spark).create(path(manifestPath(dir, id)), true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  /** Upsert one batch at file-group granularity. Only buckets whose
    * hash range the batch touches are merged and rewritten; the rest
    * carry forward by manifest reference. `nBuckets` applies at table
    * creation and is pinned in the manifest thereafter (a rehash would
    * invalidate every historical assignment). Returns the set of dirty
    * buckets rewritten (empty when the batch id was already committed).
    *
    * Scale: the dirty-bucket list is a `collect()` of ≤ nBuckets longs
    * (index metadata, not data); the merge itself is
    * [[CdcMerge.upsert]] over just the dirty buckets' rows — one hash
    * shuffle whose input is ∝ touched file groups. */
  def commit(sess: SparkSession, dir: String, batch: DataFrame, batchId: Long,
             keys: Seq[String], ord: Seq[String], nBuckets: Int = 16): Set[Long] = {
    val fs = fsOf(sess)
    // resolve any standing purge intent BEFORE taking the next id: an
    // abandoned UNCOMMITTED _PURGE_ marker sitting at a future id would
    // otherwise be reclassified as a COMMITTED purge the moment this
    // commit's id reaches it — spurious read refusals on older versions
    // now, and a wrongful forgetHistory (history + savepoints deleted
    // for a purge that never rewrote data) on the next recovery
    completePendingPurge(sess, dir)
    val committed = committedId(sess, dir)
    if (committed.exists(_ >= batchId)) Set.empty
    else {
      val (nb, current) = committed match {
        case Some(id) => val (n, _, es) = readManifest(sess, dir, id); (n, es)
        case None => (nBuckets, Seq.empty[Entry])
      }
      val withB = batch.withColumn("_bucket", bucketCol(keys, nb))
      val dirty = withB.select(col("_bucket")).distinct()
        .collect().map(_.getLong(0)).toSet
      val existingDirty = current.filter(e => dirty.contains(e.bucket))
      // ONE multi-path scan over the dirty buckets (mergeSchema
      // reconciles drifted buckets) — a per-bucket read would launch a
      // job per file group
      val existing =
        if (existingDirty.isEmpty) None
        else Some(sess.read.option("mergeSchema", "true")
          .parquet(existingDirty.map(e => s"$dir/${e.relPath}"): _*))
      val merged = existing match {
        case Some(t) => CdcMerge.upsert(t, batch, keys, ord)
        case None => CdcMerge.snapshot(batch, keys, ord)
      }
      // persisted across the write and the stats pass so the dirty
      // buckets' merge runs once, not twice
      val out = merged.withColumn("_bucket", bucketCol(keys, nb)).persist()
      out.write.mode("overwrite").partitionBy("_bucket").parquet(s"$dir/files/v$batchId")
      // per-bucket stats (single narrow agg pass); single-key tables
      // get [min,max] for stats pruning, composite keys count-only. A
      // bucket merged to EMPTY (every key deleted) yields no stats row,
      // writes no partition dir, and simply leaves the manifest.
      val statCol = if (keys.size == 1) col(keys.head).cast("long") else lit(null).cast("long")
      val blooms = if (keys.size == 1) buildBlooms(out, keys.head) else Map.empty[Long, String]
      val stats = out
        .groupBy(col("_bucket"))
        .agg(min(statCol).as("lo"), max(statCol).as("hi"), count(lit(1)).as("n"))
        .collect().map { r =>
          r.getLong(0) -> Entry(r.getLong(0), s"files/v$batchId/_bucket=${r.getLong(0)}",
            if (r.isNullAt(1)) None else Some(r.getLong(1)),
            if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3),
            blooms.get(r.getLong(0)))
        }.toMap
      out.unpersist()
      // a dirty bucket can merge to EMPTY (every key deleted) — it then
      // has no partition dir and simply leaves the manifest
      val entries = current.filterNot(e => dirty.contains(e.bucket)) ++ stats.values
      writeManifest(sess, dir, batchId, nb, merged.schema, entries)
      fs.createNewFile(path(s"$dir/_COMMIT_$batchId"))
      gc(sess, dir)
      dirty
    }
  }

  /** Drop data version-dirs and manifests referenced by neither the
    * current nor the prior manifest (two-version retention, as COW).
    * Savepointed manifests stay, and keep every data dir they
    * reference alive. */
  private def gc(sess: SparkSession, dir: String): Unit = {
    val fs = fsOf(sess)
    val ids = Ingest.snapshotVersions(sess, dir) // sorted committed ids
    val saved = Savepoints.savepoints(sess, dir)
    val keep = (ids.takeRight(2) ++ ids.filter(saved.contains)).distinct
    val referenced: Set[String] = keep.flatMap { id =>
      readManifest(sess, dir, id)._3.map(e => e.relPath.split("/").take(2).mkString("/"))
    }.toSet // files/v<id> dirs still referenced
    if (fs.exists(path(s"$dir/files")))
      fs.listStatus(path(s"$dir/files")).map(_.getPath).foreach { p =>
        if (!referenced.contains(s"files/${p.getName}")) fs.delete(p, true)
      }
    ids.dropRight(2).filterNot(saved.contains).foreach { id =>
      fs.delete(path(manifestPath(dir, id)), false)
      fs.delete(path(s"$dir/_COMMIT_$id"), false)
    }
  }

  /** Read the current snapshot: every manifest-referenced bucket dir in
    * one multi-path scan (mergeSchema reconciles buckets written under
    * drifted schemas). None before the first commit. */
  def read(sess: SparkSession, dir: String): Option[DataFrame] =
    committedId(sess, dir).flatMap(readAt(sess, dir, _))

  /** Time travel: the snapshot as of still-retained committed version
    * `id` (current, prior, or savepointed). The manifest makes this
    * exact — it lists the very files version `id` saw, including clean
    * buckets carried from older commits. Fails loudly when a purge
    * intent marker covers the requested version: between a purge's
    * manifest commit and the end of its forget-history step, older
    * manifests may still reference the purged keys — serving them
    * would silently resurrect supposedly-forgotten rows. */
  def readAt(sess: SparkSession, dir: String, id: Long): Option[DataFrame] = {
    val versions = Ingest.snapshotVersions(sess, dir)
    assertNoPurgeResurrection(sess, dir, id)
    if (!versions.contains(id)) None
    else Some {
      val (_, schema, entries) = readManifest(sess, dir, id)
      if (entries.isEmpty)
        // all keys deleted: a TYPED empty frame from the manifest schema,
        // so downstream selects still resolve
        schema.fold(sess.emptyDataFrame) { st =>
          sess.createDataFrame(sess.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
        }
      else sess.read.option("mergeSchema", "true")
        .parquet(entries.map(e => s"$dir/${e.relPath}"): _*)
        .drop("_bucket")
    }
  }

  /** Checkpointed streaming ingest at file-group granularity — the
    * third member of the service triad next to [[Ingest.run]] (table-
    * rewrite COW) and [[MergeOnRead.run]] (log-append MOR): per
    * micro-batch, parse and [[commit]] — each trigger rewrites only the
    * file groups its batch touches. Replay safety is commit()'s batch-id
    * guard; the checkpoint only avoids re-reading acked files. */
  def run(spark: SparkSession, inputDir: String, tableDir: String, checkpointDir: String,
          schema: org.apache.spark.sql.types.StructType = Envelope.employeesEnvelope,
          keys: Seq[String] = Seq("id"), ord: Seq[String] = Seq("lsn"),
          nBuckets: Int = 16): org.apache.spark.sql.streaming.StreamingQuery =
    Ingest.readTopicStream(spark, inputDir).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val parsed = Ingest.extractPostImage(batch, schema, keys)
        commit(batch.sparkSession, tableDir, parsed, batchId, keys, ord, nBuckets)
        ()
      }
      .start()

  /** Point lookup: resolve each probed key's hash bucket, drop buckets
    * whose [min,max] stats exclude it, and scan only what survives —
    * the metadata-table read path (1 file group per key instead of the
    * table). Single-long-key tables only (the stats column). */
  def pointLookup(sess: SparkSession, dir: String, keys: Seq[String],
                  probes: Seq[Long]): Option[DataFrame] =
    committedId(sess, dir).map { id =>
      val (nb, schema, entries) = readManifest(sess, dir, id)
      import sess.implicits._
      // bucket of each probe via the SAME codegen'd expression as the
      // writer (a driver-side reimplementation could drift) — AFTER
      // casting the probe to the COMMITTED key type from the manifest
      // schema: xxhash64 is type-sensitive (hash of int 5 ≠ long 5), so
      // probing a non-bigint key table at LongType would silently hash
      // every probe into the wrong bucket and return empty. A bucket
      // survives only if SOME probe both hashes into it and lies inside
      // its [min,max] — the per-probe pairing matters: with probes 1 and
      // 99, a bucket spanning [40,60] must not survive on "1 ≤ hi and
      // 99 ≥ lo"
      val keyType = schema.flatMap(st => st.fields.find(_.name == keys.head).map(_.dataType))
        .getOrElse(org.apache.spark.sql.types.LongType)
      val probePairs = probeIndex(sess, keys, probes, keyType, nb)
      // a bucket survives only if SOME probe hashes into it, lies inside
      // its [min,max], AND passes its key bloom — a negative probe costs
      // zero data-file IO (the bloom-index read path)
      val hit = entries.filter { e =>
        probePairs.exists { case (p, b, pos) =>
          b == e.bucket && e.lo.forall(p >= _) && e.hi.forall(p <= _) &&
            e.bloom.forall(bloomMightContain(_, pos))
        }
      }
      if (hit.isEmpty) read(sess, dir).get.limit(0)
      else sess.read.option("mergeSchema", "true")
        .parquet(hit.map(e => s"$dir/${e.relPath}"): _*)
        .drop("_bucket")
        .filter(col(keys.head).isin(probes: _*))
    }

  /** (probe, bucket, bloom positions) for each probed key, computed by
    * the SAME codegen'd expressions as the writer, at the committed key
    * type (see [[pointLookup]] for why both of those matter). */
  private def probeIndex(sess: SparkSession, keys: Seq[String], probes: Seq[Long],
                         keyType: org.apache.spark.sql.types.DataType, nb: Int):
      Seq[(Long, Long, Seq[Long])] = {
    import sess.implicits._
    probes.toDF(keys.head)
      .select(col(keys.head).cast(keyType).as(keys.head))
      .select(col(keys.head).cast("long").as("p"), bucketCol(keys, nb).as("b"),
        array((0 until BloomK).map(i => bloomPos(col(keys.head), i)): _*).as("pos"))
      .as[(Long, Long, Seq[Long])].collect().toSeq
  }

  /** Index-only candidate test: for each probe, can the table possibly
    * contain it? False ⇒ DEFINITELY absent (bloom + stats are
    * one-sided); true ⇒ candidate, confirm by scanning its file group.
    * This is the metadata half of [[tagKeys]], exposed so the pruning
    * property itself is testable. */
  def bloomCandidates(sess: SparkSession, dir: String, keys: Seq[String],
                      probes: Seq[Long]): Option[Map[Long, Boolean]] =
    committedId(sess, dir).map { id =>
      val (nb, schema, entries) = readManifest(sess, dir, id)
      val keyType = schema.flatMap(st => st.fields.find(_.name == keys.head).map(_.dataType))
        .getOrElse(org.apache.spark.sql.types.LongType)
      val byBucket = entries.map(e => e.bucket -> e).toMap
      probeIndex(sess, keys, probes, keyType, nb).map { case (p, b, pos) =>
        p -> byBucket.get(b).exists { e =>
          e.lo.forall(p >= _) && e.hi.forall(p <= _) &&
            e.bloom.forall(bloomMightContain(_, pos))
        }
      }.toMap
    }

  /** Hard purge — the right-to-be-forgotten operation: remove `purge`d
    * keys from the CURRENT state AND from every retained historical
    * version, savepoints included. A plain delete commit is not enough
    * (time travel and savepoint restore would resurrect the rows); a
    * purge must leave NO retained version containing the keys.
    *
    * Protocol, in order:
    *  1. resolve the buckets that can possibly hold a purged key via
    *     the manifest index (stats + bloom) — buckets whose metadata
    *     excludes every purged key are NOT rewritten (their files
    *     provably never contained the keys);
    *  2. rewrite exactly those buckets minus the purged keys as
    *     version `batchId` (stats + blooms rebuilt, so the new
    *     manifest's own index no longer admits the keys), commit the
    *     new manifest + marker — up to here this is an ordinary
    *     commit, crash-safe the same way;
    *  3. FORGET history: drop every older manifest, commit marker and
    *     savepoint, then delete every per-version bucket data dir the
    *     new manifest does not reference — data dirs are deleted LAST
    *     so at no point is a referenced file missing.
    *
    * At 100 TB the rewrite cost is ∝ buckets actually holding purged
    * keys (bloom-pruned, usually |keys| file groups), and the history
    * drop is pure metadata plus unreferenced-dir deletes.
    *
    * Crash safety does NOT rely on the operator noticing the crash: a
    * `_PURGE_<batchId>` intent marker is written before any mutation
    * and removed only after step 3 completes. While it stands,
    * [[readAt]] refuses to serve pre-purge versions (no silent
    * resurrection), and the next purgeKeys call on the table finishes
    * the forget step (marker committed) or discards the orphan rewrite
    * (marker uncommitted) before proceeding. Single-long-key tables
    * (the stats/bloom scope). Returns the rewritten bucket set. */
  def purgeKeys(sess: SparkSession, dir: String, keys: Seq[String],
                purge: Seq[Long], batchId: Long): Set[Long] = {
    require(keys.size == 1, "purgeKeys supports single-key tables (the index scope)")
    val fs = fsOf(sess)
    val id = committedId(sess, dir).getOrElse(
      throw new IllegalStateException(s"no committed table at $dir"))
    require(batchId > id, s"purge batchId $batchId must exceed committed id $id")
    // Crash recovery from a leftover intent marker (written below before
    // any mutation, removed only after the forget step completes).
    // Committed marker (pid <= committed id): the purged manifest landed
    // but history may not have been dropped — older manifests could
    // still resurrect the purged keys, so FINISH the forget from the
    // current committed manifest before doing anything else. Uncommitted
    // marker (pid > committed id): the crash hit before the manifest
    // commit, the table never changed — drop the orphan rewrite dir and
    // the marker, then proceed.
    completePendingPurge(sess, dir)
    val (nb, schema, entries) = readManifest(sess, dir, id)
    val keyType = schema.flatMap(st => st.fields.find(_.name == keys.head).map(_.dataType))
      .getOrElse(org.apache.spark.sql.types.LongType)
    val probes = probeIndex(sess, keys, purge, keyType, nb)
    val dirtyBuckets = entries.filter { e =>
      probes.exists { case (p, b, pos) =>
        b == e.bucket && e.lo.forall(p >= _) && e.hi.forall(p <= _) &&
          e.bloom.forall(bloomMightContain(_, pos))
      }
    }
    // Intent marker BEFORE any mutation: records that a purge is in
    // flight, so a crash anywhere below is DETECTED rather than silent —
    // readAt fails loudly on pre-purge versions while it stands, and the
    // next purgeKeys call completes the forget step (above). Removed
    // only after forgetHistory finishes.
    fs.createNewFile(path(purgeMarkerPath(dir, batchId)))
    // pre-mutation head recheck (the write below OVERWRITES files/
    // v<batchId>, so a concurrent commit that took this id would be
    // clobbered and its manifest replaced from the stale snapshot):
    // the store is single-writer by contract, but a stale-head purge
    // is cheap to detect here and destructive to miss
    if (!committedId(sess, dir).contains(id)) {
      fs.delete(path(purgeMarkerPath(dir, batchId)), false)
      throw new IllegalStateException(
        s"concurrent commit detected at $dir: purge resolved head v$id but the " +
          "table moved — re-run the purge against the current head")
    }
    val newEntries: Seq[Entry] =
      if (dirtyBuckets.isEmpty) entries
      else {
        val kept = sess.read.option("mergeSchema", "true")
          .parquet(dirtyBuckets.map(e => s"$dir/${e.relPath}"): _*)
          .filter(!col(keys.head).isin(purge: _*))
          .withColumn("_bucket", bucketCol(keys, nb)).persist()
        kept.write.mode("overwrite").partitionBy("_bucket").parquet(s"$dir/files/v$batchId")
        val blooms = buildBlooms(kept, keys.head)
        val stats = kept.groupBy(col("_bucket"))
          .agg(min(col(keys.head).cast("long")).as("lo"),
            max(col(keys.head).cast("long")).as("hi"), count(lit(1)).as("n"))
          .collect().map { r =>
            Entry(r.getLong(0), s"files/v$batchId/_bucket=${r.getLong(0)}",
              Some(r.getLong(1)), Some(r.getLong(2)), r.getLong(3),
              blooms.get(r.getLong(0)))
          }.toSeq
        kept.unpersist()
        val dirtySet = dirtyBuckets.map(_.bucket).toSet
        entries.filterNot(e => dirtySet.contains(e.bucket)) ++ stats
      }
    writeManifest(sess, dir, batchId, nb,
      schema.getOrElse(read(sess, dir).get.schema), newEntries)
    fs.createNewFile(path(s"$dir/_COMMIT_$batchId"))
    // step 3 — forget, then retire the intent marker
    forgetHistory(sess, dir, batchId)
    fs.delete(path(purgeMarkerPath(dir, batchId)), false)
    dirtyBuckets.map(_.bucket).toSet
  }

  /** DSv2 catalog support ([[graft.sources.FileGroupCatalog]]): the
    * table schema version `id`'s manifest records. */
  private[graft] def manifestSchema(sess: SparkSession, dir: String, id: Long):
      Option[org.apache.spark.sql.types.StructType] =
    readManifest(sess, dir, id)._2

  /** SQL maintenance support ([[graft.sources.FileGroupProcedures]]
    * `show_commits`): version `id`'s (file-group count, total rows) —
    * manifest metadata only, no data read. */
  private[graft] def manifestStats(sess: SparkSession, dir: String, id: Long): (Int, Long) = {
    val entries = readManifest(sess, dir, id)._3
    (entries.size, entries.map(_.count).sum)
  }

  /** DSv2 catalog support: the data paths version `id` references —
    * cut to the buckets that could hold `probes` when probes are given
    * (hash bucket + [min,max] stats + key bloom, the same manifest
    * index [[pointLookup]] and [[purgeKeys]] prune with). Empty probes
    * = the full snapshot's paths. */
  private[graft] def referencedPaths(sess: SparkSession, dir: String, id: Long,
                                     keys: Seq[String], probes: Seq[Long]): Seq[String] = {
    val (nb, schema, entries) = readManifest(sess, dir, id)
    val sel =
      if (probes.isEmpty) entries
      else {
        val keyType = schema.flatMap(st => st.fields.find(_.name == keys.head).map(_.dataType))
          .getOrElse(org.apache.spark.sql.types.LongType)
        val pr = probeIndex(sess, keys, probes, keyType, nb)
        entries.filter { e =>
          pr.exists { case (p, b, pos) =>
            b == e.bucket && e.lo.forall(p >= _) && e.hi.forall(p <= _) &&
              e.bloom.forall(bloomMightContain(_, pos))
          }
        }
      }
    sel.map(e => s"$dir/${e.relPath}")
  }

  /** Finish (or discard) a crashed purge WITHOUT purging further keys —
    * the recovery step every [[purgeKeys]] call runs first, exposed on
    * its own so an operator can clear a standing intent marker
    * directly. Committed marker (pid <= committed id): the purged
    * manifest landed but history wasn't dropped — complete the forget
    * relative to the CRASHED purge's id, so versions committed AFTER
    * the crash (pid < v) and their savepoints/data are outside the
    * purge's mandate and survive. Uncommitted marker (pid > committed
    * id): the table never changed — discard the orphan rewrite dir.
    * Returns the cleared marker's id; None when nothing is pending
    * (or the table has no committed version to recover against). */
  def completePendingPurge(sess: SparkSession, dir: String): Option[Long] = {
    val fs = fsOf(sess)
    committedId(sess, dir).flatMap { id =>
      pendingPurge(sess, dir).map { pid =>
        if (pid <= id) forgetHistory(sess, dir, pid)
        else fs.delete(path(s"$dir/files/v$pid"), true)
        fs.delete(path(purgeMarkerPath(dir, pid)), false)
        pid
      }
    }
  }

  /** The purge-resurrection guard behind [[readAt]] AND the SQL
    * catalog's `VERSION AS OF` / `TIMESTAMP AS OF` path
    * ([[graft.sources.FileGroupCatalog]] routes through here so the
    * two doors can never disagree): while a COMMITTED purge's intent
    * marker stands (crash between its manifest commit and the
    * forget-history step), versions that PREDATE the purge may still
    * reference the purged keys — serving them would silently resurrect
    * supposedly-forgotten rows, so the read fails loudly instead.
    * Only a committed purge (pid <= current id) can have left
    * un-forgotten history; an uncommitted marker means the purge never
    * landed and every retained version is untouched. */
  private[graft] def assertNoPurgeResurrection(sess: SparkSession, dir: String,
                                               id: Long): Unit = {
    val versions = Ingest.snapshotVersions(sess, dir)
    pendingPurge(sess, dir).foreach { pid =>
      if (versions.lastOption.exists(pid <= _) && id < pid && versions.contains(id))
        throw new IllegalStateException(
          s"purge $pid is pending at $dir (crash between commit and history " +
            s"drop): version $id predates it and may still hold purged keys — " +
            "re-run purgeKeys (any key set) to complete the purge first")
    }
  }

  /** Commit instant of retained version `id` — the `_COMMIT_<id>`
    * marker's filesystem mtime (epoch millis). The marker is written
    * atomically LAST in every commit path, so its mtime IS the moment
    * the version became readable. Drives the SQL catalog's
    * `TIMESTAMP AS OF` resolution. */
  private[graft] def commitTimeOf(sess: SparkSession, dir: String,
                                  id: Long): Option[Long] = {
    val fs = fsOf(sess)
    val p = path(s"$dir/_COMMIT_$id")
    if (fs.exists(p)) Some(fs.getFileStatus(p).getModificationTime) else None
  }

  private def purgeMarkerPath(dir: String, id: Long) = s"$dir/_PURGE_$id"

  /** Pending purge intent, if any: a `_PURGE_<batchId>` marker is
    * written before a purge mutates anything and removed only after its
    * forget-history step completes — a leftover marker means a crash
    * mid-purge. [[readAt]] refuses pre-purge versions while one stands;
    * the next [[purgeKeys]] call completes or discards it. */
  def pendingPurge(sess: SparkSession, dir: String): Option[Long] = {
    val fs = fsOf(sess)
    if (!fs.exists(path(dir))) None
    else fs.listStatus(path(dir)).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("_PURGE_") => n.stripPrefix("_PURGE_").toLong }
      .sorted.lastOption
  }

  /** Purge step 3 — forget history: drop every manifest + commit marker
    * + savepoint STRICTLY OLDER than `batchId` (the purge's own id —
    * never the current committed id: in crash recovery, commits that
    * landed AFTER the crashed purge are legitimate post-purge history
    * outside the purge's mandate and must keep their manifests, data
    * and savepoints), then delete each per-version bucket dir no
    * SURVIVING manifest references — the union over every still-
    * retained version, recomputed after the manifest drop, so a file
    * referenced only by a post-purge commit survives recovery. Data
    * dirs go LAST so no still-referenced file is ever missing; every
    * delete is idempotent, so re-running to complete a crashed purge
    * is safe. */
  private def forgetHistory(sess: SparkSession, dir: String, batchId: Long): Unit = {
    val fs = fsOf(sess)
    Ingest.snapshotVersions(sess, dir).filter(_ < batchId).foreach { v =>
      fs.delete(path(manifestPath(dir, v)), false)
      fs.delete(path(s"$dir/_COMMIT_$v"), false)
    }
    Savepoints.savepoints(sess, dir).filter(_ < batchId).foreach(spId =>
      fs.delete(path(s"$dir/_SAVEPOINT_$spId"), false))
    val referenced: Set[String] = Ingest.snapshotVersions(sess, dir)
      .flatMap(v => readManifest(sess, dir, v)._3.map(_.relPath)).toSet
    if (fs.exists(path(s"$dir/files")))
      fs.listStatus(path(s"$dir/files")).foreach { vdir =>
        fs.listStatus(vdir.getPath).foreach { bdir =>
          val rel = s"files/${vdir.getPath.getName}/${bdir.getPath.getName}"
          if (bdir.getPath.getName.startsWith("_bucket=") && !referenced.contains(rel))
            fs.delete(bdir.getPath, true)
        }
        if (fs.listStatus(vdir.getPath).isEmpty) fs.delete(vdir.getPath, true)
      }
  }

  /** Hudi-style index tagging: classify each incoming key as `update`
    * (already in the table) or `insert` (new) — the step every upsert
    * batch pays before routing records to file groups. Bloom+stats
    * answer the negative cases from manifest metadata alone; only
    * candidate keys' file groups are scanned (one multi-path read) to
    * squeeze out false positives, so the result is EXACT. At 100 TB a
    * batch probing k keys touches ≤ k file groups and usually far fewer
    * — never the table. */
  def tagKeys(sess: SparkSession, dir: String, keys: Seq[String],
              probes: Seq[Long]): Option[DataFrame] =
    committedId(sess, dir).map { id =>
      import sess.implicits._
      val cand = bloomCandidates(sess, dir, keys, probes).get
      val candidateKeys = probes.filter(cand(_))
      val existing: Set[Long] =
        if (candidateKeys.isEmpty) Set.empty
        else pointLookup(sess, dir, keys, candidateKeys).get
          .select(col(keys.head).cast("long")).as[Long].collect().toSet
      probes.toDF(keys.head)
        .withColumn("tag",
          when(col(keys.head).isin(existing.toSeq: _*), lit("update"))
            .otherwise(lit("insert")))
    }
}
