package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("Text.shingles: n-grams with 1-based element_at, empty when short") {
    val df = Seq("a b c d", "a").toDF("text")
      .select(Text.shingles(Text.tokens($"text"), 2).as("sh"))
    val got = df.as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a b", "b c", "c d"), Seq()))
  }

  test("NgramShingles codegen == composed higher-order form, string-exact") {
    val docs = (1 to 100).map(i => ((1 to i % 12).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("text").withColumn("toks", Text.tokens($"text"))
    for (n <- Seq(2, 3, 5)) {
      val rows = docs.select(
        Text.shingles($"toks", n).as("fast"),
        Text.shinglesComposed($"toks", n).as("slow"))
        .as[(Seq[String], Seq[String])].collect()
      assert(rows.forall { case (f, sl) => f == sl }, s"n=$n")
    }
  }

  test("Text.jaccard: identical → 1.0, disjoint → 0.0") {
    val df = Seq(
      (Seq("x", "y"), Seq("x", "y")),
      (Seq("x"), Seq("y"))).toDF("a", "b")
      .select(Text.jaccard($"a", $"b").as("j"))
    assert(df.as[Double].collect().toSeq == Seq(1.0, 0.0))
  }

  test("Text.simhash16Portable: deterministic, 16-bit range, similarity-sensitive") {
    val df = Seq("spark sql engine", "spark sql engine", "completely different words here")
      .toDF("text").select(Text.simhash16Portable(Text.tokens($"text")).as("h"))
    val hs = df.as[Int].collect()
    assert(hs(0) == hs(1))
    assert(hs.forall(h => h >= 0 && h < 65536))
  }

  test("Text.rollingHashes: window count, determinism, short-doc empty") {
    val df = Seq("abcdefghij", "short").toDF("t")
      .select(Text.rollingHashes($"t", 8).as("h"))
    val rows = df.as[Seq[Long]].collect()
    assert(rows(0).length == 3) // 10 chars, w=8 -> 3 windows
    assert(rows(1).isEmpty)
    // hand-computed first window: sum of ascii('a'+j)*31^(7-j) mod (2^31-1)
    val want = (0 until 8).map(j => ('a' + j).toLong * math.pow(31, 7 - j).toLong).sum % 2147483647L
    assert(rows(0).head == want)
  }

  test("Text.hash48 fits in 48 bits and matches conv semantics") {
    val h = Seq("abc").toDF("t").select(Text.hash48($"t").as("h")).as[Long].head()
    assert(h >= 0 && h < (1L << 48))
  }

  test("FloatDot codegen expression == composed higher-order form, bitwise") {
    val df = (1 to 200).map { i =>
      (Seq.tabulate(64)(d => (math.sin(i * 64 + d) * 3).toFloat),
       Seq.tabulate(64)(d => (math.cos(i * 64 + d) * 3).toFloat))
    }.toDF("a", "b")
    val rows = df.select(
      Vectors.dot($"a", $"b").as("fast"),
      Vectors.dotComposed($"a", $"b").as("slow")).as[(Double, Double)].collect()
    assert(rows.forall { case (f, sl) => f == sl }) // exact, not approximate
    // null propagation + ragged-length null (matches zip_with padding)
    val n = Seq(
      (Seq(1f), null.asInstanceOf[Seq[Float]]),
      (Seq(1f, 2f), Seq(3f))).toDF("a", "b")
      .select(Vectors.dot($"a", $"b").as("fast"), Vectors.dotComposed($"a", $"b").as("slow"))
      .collect()
    assert(n.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("LongDot codegen expression == composed higher-order form, exact") {
    val df = (1 to 200).map { i =>
      (Seq.tabulate(64)(d => ((i * 64 + d) % 255 - 127).toLong),
       Seq.tabulate(64)(d => ((i * 31 + d * 7) % 255 - 127).toLong))
    }.toDF("a", "b")
    val rows = df.select(
      Vectors.longDot($"a", $"b").as("fast"),
      Vectors.longDotComposed($"a", $"b").as("slow")).as[(Long, Long)].collect()
    assert(rows.forall { case (f, sl) => f == sl })
    // null propagation + ragged-length null (matches zip_with padding)
    val n = Seq(
      (Seq(1L), null.asInstanceOf[Seq[Long]]),
      (Seq(1L, 2L), Seq(3L))).toDF("a", "b")
      .select(Vectors.longDot($"a", $"b").as("fast"),
        Vectors.longDotComposed($"a", $"b").as("slow"))
      .collect()
    assert(n.forall(r => r.isNullAt(0) && r.isNullAt(1)))
    // null ELEMENTS (containsNull=true): null the product, both forms;
    // repartition defeats ConvertToLocalRelation so codegen runs
    val e = Seq(
      (Seq(Option(1L), None), Seq(Option(3L), Option(4L))),
      (Seq(Option(1L), Option(2L)), Seq(Option(3L), Option(4L)))).toDF("a", "b")
      .repartition(1)
      .select(Vectors.longDot($"a", $"b").as("fast"),
        Vectors.longDotComposed($"a", $"b").as("slow"))
      .collect()
    assert(e.forall(r => r.isNullAt(0) == r.isNullAt(1)))
    assert(e.count(_.isNullAt(0)) == 1)
    assert(e.filterNot(_.isNullAt(0)).head.getLong(0) == 11L)
  }

  test("PqEncode kernel == composed pqAssign/pqRecon forms, on real codes") {
    import org.apache.spark.sql.functions._
    // the codegen'd kernel and the least-fold reference must agree on
    // every code and every reconstructed element — argmin value AND
    // tie direction (lowest codeword id)
    val coded = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
      .select(col("vec_id"), Vectors.sq8(col("v"), col("nrm")).as("qc"))
    val cb = Vectors.pqCodebook(coded, "vec_id", "qc", m = 16, ncw = 32)
    val cbVecs = cb.map(_.map(_._2))
    val slowCodes = Vectors.pqAssign(col("qc"), cb)
    val rows = coded
      .withColumn("fast_codes", graft.functions.PqEncode.codes(col("qc"), cbVecs))
      .withColumn("slow_codes", array(slowCodes: _*))
      .withColumn("fast_recon", graft.functions.PqEncode.recon(col("qc"), cbVecs))
      .withColumn("slow_recon", Vectors.pqRecon(slowCodes, cb))
      .filter(col("fast_codes") =!= col("slow_codes") ||
        col("fast_recon") =!= col("slow_recon"))
      .count()
    assert(rows == 0L)
    // null in -> null out; wrong length -> null (surfaced, not truncated)
    val n = Seq(Seq(1L, 2L), null.asInstanceOf[Seq[Long]]).toDF("qc")
      .select(graft.functions.PqEncode.codes(col("qc"), cbVecs).as("c"))
      .collect()
    assert(n.forall(_.isNullAt(0)))
  }

  test("FloatDot/NgramShingles: null ELEMENTS match the composed forms (codegen + eval)") {
    // containsNull=true inputs: a null element must null the dot product
    // (acc + null nulls the composed fold) and be SKIPPED by shingling
    // (concat_ws skips null args) — not read as 0.0f / "" off the unsafe
    // array's zeroed slot. repartition defeats ConvertToLocalRelation so
    // the codegen path actually runs.
    val vdf = Seq(
      (Seq(Option(1f), None, Option(2f)), Seq(Option(3f), Option(4f), Option(5f))),
      (Seq(Option(1f), Option(2f)), Seq(Option(3f), Option(4f)))).toDF("a", "b")
      .repartition(1)
    val vrows = vdf.select(
      Vectors.dot($"a", $"b").as("fast"),
      Vectors.dotComposed($"a", $"b").as("slow")).collect()
    assert(vrows.forall(r => r.isNullAt(0) == r.isNullAt(1)))
    assert(vrows.count(_.isNullAt(0)) == 1)
    assert(vrows.filterNot(_.isNullAt(0)).head.getDouble(0) == 11.0)

    val tdf = Seq(
      Seq(Option("a"), None, Option("b"), Option("c")),
      Seq(Option("x"), Option("y"))).toDF("toks").repartition(1)
    val trows = tdf.select(
      Text.shingles($"toks", 2).as("fast"),
      Text.shinglesComposed($"toks", 2).as("slow"))
      .as[(Seq[String], Seq[String])].collect()
    assert(trows.forall { case (f, sl) => f == sl })
    assert(trows.map(_._1).toSet == Set(Seq("a", "b", "b c"), Seq("x y")))
  }

  test("graft_dot is SQL-callable after registration") {
    graft.functions.GraftExtensions.register(spark)
    Seq((Seq(1f, 2f), Seq(3f, 4f))).toDF("a", "b").createOrReplaceTempView("vt")
    assert(spark.sql("SELECT graft_dot(a, b) AS d FROM vt").as[Double].head() == 11.0)
    // type check rejects wrong input types with a clear message
    val e = intercept[Exception](spark.sql("SELECT graft_dot(1, 2)").collect())
    assert(e.getMessage.contains("array<float>"))
  }

  test("Vectors.dot/norm/cosine on known vectors") {
    val df = Seq((Seq(1f, 0f), Seq(0f, 1f)), (Seq(3f, 4f), Seq(3f, 4f)))
      .toDF("a", "b")
      .select(Vectors.dot($"a", $"b").as("d"), Vectors.norm($"a").as("n"))
    val rows = df.as[(Double, Double)].collect()
    assert(rows(0) == ((0.0, 1.0)))
    assert(rows(1) == ((25.0, 5.0)))
  }

  test("sign-LSH hyperplanes: deterministic, dyadic, full recall on adversarial leading dims") {
    val planes = Vectors.hyperplanes(8, 64)
    // deterministic and exactly dyadic (k/64 — representable in float AND
    // double, the property that makes the oracle replay bit-for-bit)
    assert(planes.map(_.toSeq) == Vectors.hyperplanes(8, 64).map(_.toSeq))
    assert(planes.flatten.forall(c => c * 64 == math.rint(c * 64) && c >= -1 && c <= 1))
    // not degenerate: planes differ and use many distinct values
    assert(planes.map(_.toSeq).distinct.size == 8)

    // 20 planted near-dup pairs whose first 8 dims hover at ±1e-6 with
    // OPPOSITE signs between the twins — an axis-aligned first-8-dims
    // sign key puts every such pair in different buckets (recall 0);
    // random hyperplanes weigh all 64 dims, so the tiny dims never flip
    // a bucket bit and every pair is recovered.
    val rnd = new scala.util.Random(7)
    val rows = (0 until 20).flatMap { p =>
      val tail = Array.fill(56)((rnd.nextDouble() * 2 - 1).toFloat)
      Seq((2L * p, (Array.fill(8)(1e-6f) ++ tail).toSeq),
          (2L * p + 1, (Array.fill(8)(-1e-6f) ++ tail).toSeq))
    }
    val emb = rows.toDF("vec_id", "embedding")
    // sanity of the plant: the twins really do disagree on every leading sign
    val axisAligned = concat_ws("", (1 to 8).map(i =>
      when(element_at($"embedding", i) >= 0, lit("1")).otherwise(lit("0"))): _*)
    assert(emb.select(axisAligned).distinct().count() == 2)
    val pairs = Vectors.nearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.99, bits = 8, dim = 64)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val want = (0 until 20).map(p => (2L * p, 2L * p + 1)).toSet
    assert(want.subsetOf(pairs), s"missed: ${want -- pairs}")
  }

  test("Vectors.bruteForceTopK returns k neighbors per vector") {
    val emb = (1 to 6).map(i => (i.toLong, Seq(i.toFloat, (i * i).toFloat, 1f)))
      .toDF("vec_id", "embedding")
    val top = Vectors.bruteForceTopK(emb, "vec_id", "embedding", k = 2)
    assert(top.groupBy("vec_id").count().select("count").as[Long].collect().forall(_ == 2))
  }

  test("Multimodal: attach schema, decode batch shape, frame sampling") {
    val docs = Seq((1L, "hello world"), (2L, "x")).toDF("doc_id", "text")
    val attached = Multimodal.attach(docs)
    assert(attached.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .map(f => (f.name, f.dataType)) == Multimodal.metaSchema.map(f => (f.name, f.dataType)))
    assert(attached.select(length($"content")).as[Int].collect().forall(_ == 16))

    val feats = Multimodal.decodeFeatures(attached)
    assert(feats.select(size($"features")).as[Int].collect().forall(_ == 4))

    val frames = Multimodal.frameSample(attached, frameBytes = 4)
    // 16 bytes / 4 = 4 frames per doc, each exactly 4 bytes
    assert(frames.count() == 8)
    assert(frames.select(length($"frame")).as[Int].collect().forall(_ == 4))

    val resized = Multimodal.resizeStub(attached, 128, 128)
    assert(resized.select($"meta.width", $"meta.height").as[(Int, Int)]
      .collect().forall(_ == ((128, 128))))
    // 128*128/4096 = 4 bytes of the 16-byte digest survive the downsample
    assert(resized.select(length($"content")).as[Int].collect().forall(_ == 4))
  }

  test("lang profiles predict their own stopwords") {
    val df = Seq("the cat is on a mat and the dog", "der hund ist und die katze")
      .toDF("text").withColumn("toks", Text.tokens(lower($"text")))
    val scores = Text.langProfiles.map { case (l, sw) => l -> Text.langScore($"toks", sw) }
    val preds = df.select(Text.langPredict(scores).as("p")).as[String].collect().toSeq
    assert(preds == Seq("en", "de"))
  }

  test("assignTopN: narrow centroid-literal assign equals the join+window reference bit-for-bit") {
    // the narrow argmax (sorted literal structs, zero shuffles) must
    // reproduce the broadcast-join + row_number window it replaced —
    // same rows, same cosines, same tie-breaks, for single and
    // multi-probe assignment
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Vectors.kmeans(emb, "vec_id", "embedding", k = 4, iters = 1)
    def reference(n: Int) = {
      val withNorm = emb.select($"vec_id", $"embedding".as("v"))
        .withColumn("nrm", Vectors.norm($"v"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"vec_id").orderBy($"ccos".desc, $"c_id")
      withNorm.join(broadcast(cents.select($"c_id", $"cv", Vectors.norm($"cv").as("cnrm"))))
        .withColumn("ccos", Vectors.cosine($"v", $"cv", $"nrm", $"cnrm"))
        .withColumn("arn", row_number().over(w)).filter($"arn" <= n)
        .select($"vec_id", $"c_id".as("cluster"), $"ccos".as("cos"), $"arn".as("probe"))
    }
    for (n <- Seq(1, 3)) {
      val got = Vectors.assignTopN(emb, "vec_id", "embedding", cents, n)
        .select($"vec_id", $"cluster", $"cos", $"probe")
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
      val want = reference(n)
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
      assert(got == want, s"narrow assign diverged from reference at n=$n")
    }
    // and it is actually narrow: no exchange anywhere in the plan
    val plan = Vectors.assignTopN(emb, "vec_id", "embedding", cents, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignTopN plan has a shuffle:\n$plan")
  }

  test("ivfTopK: multi-probe recall dominates single-probe, vs brute-force truth") {
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Vectors.kmeans(emb, "vec_id", "embedding", k = 4, iters = 2)
    val truth = Vectors.bruteForceTopK(emb, "vec_id", "embedding", 3)
      .filter($"vec_id" <= 50)
      .select($"vec_id", $"nn_id").as[(Long, Long)].collect().toSet
    def recall(nprobe: Int): Double = {
      val got = Vectors.ivfTopK(emb, "vec_id", "embedding", cents, 3, nprobe,
          $"vec_id" <= 50)
        .select($"vec_id", $"nn_id").as[(Long, Long)].collect().toSet
      (truth & got).size.toDouble / truth.size
    }
    val (r1, r2) = (recall(1), recall(2))
    assert(r2 >= r1, s"probing more clusters lowered recall: $r1 -> $r2")
    assert(r2 >= 0.5, s"nprobe=2 recall $r2 below floor") // measured headroom
    // full probe = exact: every cluster searched recovers brute force
    assert(recall(4) == 1.0)
  }

  test("annJoin: nprobe is monotone; full probe equals the brute-force threshold join exactly") {
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Vectors.kmeans(emb, "vec_id", "embedding", k = 4, iters = 2)
    val queries = emb.filter($"vec_id" < 100)
    val corpus = emb.filter($"vec_id" >= 100)
    def pairs(nprobe: Int): Set[(Long, Long)] =
      Vectors.annJoin(queries, corpus, "vec_id", "embedding", cents, nprobe, 0.3)
        .select($"vec_id", $"nn_id").as[(Long, Long)].collect().toSet
    val Seq(p1, p2, p4) = Seq(1, 2, 4).map(pairs)
    assert(p1.subsetOf(p2) && p2.subsetOf(p4),
      "probing more clusters must only ADD pairs")
    // exhaustive probe: every query sees every cluster — exactly brute force
    val brute = {
      val q = queries.select($"vec_id", $"embedding".as("v"))
        .withColumn("nrm", Vectors.norm($"v"))
      val c = broadcast(corpus.select($"vec_id".as("nn_id"),
        $"embedding".as("v2")).withColumn("nrm2", Vectors.norm($"v2")))
      q.join(c).filter(Vectors.cosine($"v", $"v2", $"nrm", $"nrm2") > 0.3)
        .select($"vec_id", $"nn_id").as[(Long, Long)].collect().toSet
    }
    assert(p4 == brute, s"full-probe annJoin diverged: ${(p4 diff brute).size} extra, ${(brute diff p4).size} missing")
    assert(brute.nonEmpty)
  }

  test("persisted IVF index: serves the same answers as the in-memory path, partition-pruned") {
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = tmpDir("graft_ivfidx")
    IvfIndex.build(spark, dir, emb, "vec_id", "embedding", k = 4, iters = 2)
    assert(IvfIndex.exists(spark, dir))

    // identical results to ivfTopK over the same (persisted) centroids —
    // floats round-trip parquet bit-exactly, so assignment and scores agree
    val cents = spark.read.parquet(s"$dir/centroids")
    val fresh = Vectors.ivfTopK(emb, "vec_id", "embedding", cents, 3, 2, $"vec_id" <= 20)
      .select($"vec_id", $"rn", $"nn_id", $"cos").collect().toSet
    val served = IvfIndex.topK(spark, dir, emb.filter($"vec_id" <= 20),
        "vec_id", "embedding", k = 3, nprobe = 2)
      .select($"vec_id", $"rn", $"nn_id", $"cos").collect().toSet
    assert(served == fresh)

    // serving cost ∝ probed partitions: the corpus scan a single
    // nprobe=1 query triggers (cluster partition filter) touches
    // strictly fewer files than the whole index holds
    val total = spark.read.parquet(s"$dir/corpus")
      .select(input_file_name()).distinct().count()
    val probedCluster = Vectors.assignTopN(emb.filter($"vec_id" === 5),
        "vec_id", "embedding", cents, 1)
      .select($"cluster").as[Long].head()
    val one = spark.read.parquet(s"$dir/corpus")
      .filter($"cluster" === probedCluster)
      .select(input_file_name()).distinct().count()
    assert(one > 0 && one < total, s"single-probe scan touched $one of $total index files")
  }

  test("IvfIndex append: deltas serve, replay is a no-op, unmarked dirs invisible, rebuild clears") {
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = tmpDir("graft_ivfd")
    val base = emb.filter(pmod($"vec_id", lit(5)) =!= 0)
    val batch = emb.filter(pmod($"vec_id", lit(5)) === 0)
    IvfIndex.build(spark, dir, base, "vec_id", "embedding", k = 4, iters = 1)
    assert(IvfIndex.append(spark, dir, batch, "vec_id", "embedding", 0L))
    assert(!IvfIndex.append(spark, dir, batch, "vec_id", "embedding", 0L)) // replay no-op

    // base + delta served together == the in-memory path over the full
    // corpus with the same persisted centroids (assignment is per-row
    // deterministic, so the union of assignments IS the assignment of
    // the union)
    val cents = spark.read.parquet(s"$dir/centroids")
    def proj(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"rn", $"nn_id", $"cos").collect().toSet
    val fresh = proj(Vectors.ivfTopK(emb, "vec_id", "embedding", cents, 3, 2, $"vec_id" <= 20))
    val served = proj(IvfIndex.topK(spark, dir, emb.filter($"vec_id" <= 20),
      "vec_id", "embedding", k = 3, nprobe = 2))
    assert(served == fresh)

    // crash-shaped delta: an assigned dir without its marker never
    // serves — the impostors carry the originals' vectors (cos 1.0,
    // guaranteed top-k) under ids +10000, so a leak is unmissable
    Vectors.assignToCentroids(batch.withColumn("vec_id", $"vec_id" + 10000),
        "vec_id", "embedding", cents)
      .select($"cluster", $"vec_id", $"v", $"nrm")
      .write.mode("overwrite").partitionBy("cluster").parquet(s"$dir/corpus_d7")
    val after = IvfIndex.topK(spark, dir, emb.filter($"vec_id" <= 20),
        "vec_id", "embedding", k = 3, nprobe = 2)
      .select($"nn_id").as[Long].collect()
    assert(!after.exists(_ >= 10000L), "unmarked delta dir must be invisible")

    // rebuild: prior deltas (committed and orphaned) are gone, serving
    // reflects the base corpus only
    IvfIndex.build(spark, dir, base, "vec_id", "embedding", k = 4, iters = 1)
    assert(IvfIndex.deltaIds(spark, dir).isEmpty, "rebuild must drop committed delta markers")
    val cents2 = spark.read.parquet(s"$dir/centroids")
    val baseOnly = proj(Vectors.ivfTopK(base, "vec_id", "embedding", cents2, 3, 2, $"vec_id" <= 20))
    val served2 = proj(IvfIndex.topK(spark, dir, base.filter($"vec_id" <= 20),
      "vec_id", "embedding", k = 3, nprobe = 2))
    assert(served2 == baseOnly, "stale delta rows resurfaced after rebuild")
  }

  test("persisted IVF-PQ index: serves bit-identical to the in-memory composed path, both tiers pruned") {
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = tmpDir("graft_ivfpqidx")
    IvfPqIndex.build(spark, dir, emb, "vec_id", "embedding",
      k = 4, iters = 2, m = 16, ncw = 16)
    assert(IvfPqIndex.exists(spark, dir))

    // bit-identical to ivfPqSearch over the same persisted centroids:
    // floats round-trip parquet exactly, the codebook is deterministic
    // (first-ncw-by-id), and every score after the coarse assign is an
    // integer — so build/serve introduces ZERO drift
    val cents = spark.read.parquet(s"$dir/centroids")
      .select($"c_id", $"cv")
    val fresh = Vectors.ivfPqSearch(emb, "vec_id", "embedding", cents,
        m = 16, ncw = 16, queryPred = $"vec_id" <= 20, nprobe = 2, candR = 30, k = 3)
      .select($"vec_id", $"rn", $"nn_id", $"score").collect().toSet
    val served = IvfPqIndex.topK(spark, dir, emb.filter($"vec_id" <= 20),
        "vec_id", "embedding", k = 3, nprobe = 2, candR = 30)
      .select($"vec_id", $"rn", $"nn_id", $"score").collect().toSet
    assert(served == fresh)

    // serving cost ∝ probed partitions on BOTH tiers: a single
    // nprobe=1 query's cluster filter touches strictly fewer files
    // than each full tier holds
    val probedCluster = Vectors.assignTopN(emb.filter($"vec_id" === 5),
        "vec_id", "embedding", cents, 1)
      .select($"cluster").as[Long].head()
    for (tier <- Seq("codes", "refine")) {
      val total = spark.read.parquet(s"$dir/$tier")
        .select(input_file_name()).distinct().count()
      val one = spark.read.parquet(s"$dir/$tier")
        .filter($"cluster" === probedCluster)
        .select(input_file_name()).distinct().count()
      assert(one > 0 && one < total, s"$tier: single-probe scan touched $one of $total files")
    }

    // the codes tier stores m SMALL ids per vector (what a PQ index
    // ships), not reconstructions: every stored code array has length
    // m and values in [0, ncw)
    val pqStats = spark.read.parquet(s"$dir/codes")
      .select(size($"pq").as("len"),
        array_max($"pq").as("mx"), array_min($"pq").as("mn"))
      .agg(min($"len"), max($"len"), max($"mx"), min($"mn"))
      .as[(Int, Int, Long, Long)].head()
    assert(pqStats._1 == 16 && pqStats._2 == 16 &&
      pqStats._3 < 16L && pqStats._4 >= 0L, s"stored codes malformed: $pqStats")
  }

  test("IvfPqIndex build with trained codebook: serve still bit-identical to the composed path") {
    // the cbIters dial trains the persisted codebook once at BUILD
    // time; serving must stay bit-identical to ivfPqSearch with the
    // same trainIters over the same persisted centroids
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = tmpDir("graft_ivfpqidx_tr")
    IvfPqIndex.build(spark, dir, emb, "vec_id", "embedding",
      k = 4, iters = 2, m = 16, ncw = 16, cbIters = 2)
    val cents = spark.read.parquet(s"$dir/centroids").select($"c_id", $"cv")
    val fresh = Vectors.ivfPqSearch(emb, "vec_id", "embedding", cents,
        m = 16, ncw = 16, queryPred = $"vec_id" <= 20, nprobe = 2, candR = 30, k = 3,
        trainIters = 2)
      .select($"vec_id", $"rn", $"nn_id", $"score").collect().toSet
    val served = IvfPqIndex.topK(spark, dir, emb.filter($"vec_id" <= 20),
        "vec_id", "embedding", k = 3, nprobe = 2, candR = 30)
      .select($"vec_id", $"rn", $"nn_id", $"score").collect().toSet
    assert(served == fresh, "trained-codebook index diverged from the composed path")
    // and the trained codebook actually differs from the sampled init
    // (otherwise the dial is a no-op on this corpus)
    val sampledDir = tmpDir("graft_ivfpqidx_tr0")
    IvfPqIndex.build(spark, sampledDir, emb, "vec_id", "embedding",
      k = 4, iters = 2, m = 16, ncw = 16)
    val cbA = spark.read.parquet(s"$dir/codebook").collect().toSet
    val cbB = spark.read.parquet(s"$sampledDir/codebook").collect().toSet
    assert(cbA != cbB, "cbIters=2 produced the same codebook as the sampled init")
  }

  test("IvfPqIndex append: delta serve is VALUE-exact vs in-memory, replay no-op, rebuild clears") {
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = tmpDir("graft_ivfpqd")
    // PREFIX split: base owns every id < 150, so the union's
    // first-ncw-by-id codebook sample and first-k centroid init are
    // the BASE's — which makes the in-memory ivfPqSearch over the
    // union (deriving its codebook from its own input) sample exactly
    // the persisted artifacts, and the delta serve path becomes
    // BIT-EXACTLY comparable, not just shape-checked
    val base = emb.filter($"vec_id" < 150)
    val batch = emb.filter($"vec_id" >= 150)
    IvfPqIndex.build(spark, dir, base, "vec_id", "embedding",
      k = 4, iters = 1, m = 16, ncw = 16)
    assert(IvfPqIndex.append(spark, dir, batch, "vec_id", "embedding", 0L))
    assert(!IvfPqIndex.append(spark, dir, batch, "vec_id", "embedding", 0L)) // replay no-op

    // the delta rows are physically in the codes tier, 1:1 with the batch
    assert(spark.read.parquet(s"$dir/codes_d0").count() == batch.count())

    // base + delta served together == in-memory over the union with
    // the persisted centroids — a wrong neighbor, score, or tie-break
    // for any delta-resident vector breaks set equality
    def proj(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"rn", $"nn_id", $"score").collect().toSet
    val cents = spark.read.parquet(s"$dir/centroids").select($"c_id", $"cv")
    val fresh = proj(Vectors.ivfPqSearch(emb, "vec_id", "embedding", cents,
      m = 16, ncw = 16, queryPred = $"vec_id" <= 20, nprobe = 2, candR = 30, k = 3))
    val served = proj(IvfPqIndex.topK(spark, dir, emb.filter($"vec_id" <= 20),
      "vec_id", "embedding", k = 3, nprobe = 2, candR = 30))
    assert(served == fresh, "delta serve path diverged from the in-memory composition")
    // ...and the delta actually participates: the union result differs
    // from a base-only serve (the appended vectors change some top-k)
    val baseOnlyNow = proj(Vectors.ivfPqSearch(base, "vec_id", "embedding", cents,
      m = 16, ncw = 16, queryPred = $"vec_id" <= 20, nprobe = 2, candR = 30, k = 3))
    assert(served != baseOnlyNow, "appended vectors never influenced any result")

    // an EMPTY batch commits marker-only and serving keeps working
    assert(IvfPqIndex.append(spark, dir,
      emb.filter($"vec_id" < 0), "vec_id", "embedding", 1L))
    assert(IvfPqIndex.deltaIds(spark, dir) == Seq(0L, 1L))
    assert(proj(IvfPqIndex.topK(spark, dir, emb.filter($"vec_id" <= 20),
      "vec_id", "embedding", k = 3, nprobe = 2, candR = 30)) == fresh,
      "empty delta changed or broke serving")

    // rebuild clears deltas (committed markers gone, stale rows never
    // resurface)
    IvfPqIndex.build(spark, dir, base, "vec_id", "embedding",
      k = 4, iters = 1, m = 16, ncw = 16)
    assert(IvfPqIndex.deltaIds(spark, dir).isEmpty)
    val cents2 = spark.read.parquet(s"$dir/centroids").select($"c_id", $"cv")
    val baseOnly = proj(Vectors.ivfPqSearch(base, "vec_id", "embedding", cents2,
      m = 16, ncw = 16, queryPred = $"vec_id" <= 20, nprobe = 2, candR = 30, k = 3))
    val served2 = proj(IvfPqIndex.topK(spark, dir, base.filter($"vec_id" <= 20),
      "vec_id", "embedding", k = 3, nprobe = 2, candR = 30))
    assert(served2 == baseOnly, "stale delta rows resurfaced after rebuild")
  }

  test("empty-batch deltas commit marker-only and never break serving (all three indexes)") {
    // an empty partitioned parquet write produces a schema-less dir
    // (only _SUCCESS) that fails every later read — the shared
    // DeltaProtocol rule is marker-only for empty batches, and all
    // delta readers take only dirs that exist
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")

    val ivfDir = tmpDir("graft_ivf_empty")
    IvfIndex.build(spark, ivfDir, emb, "vec_id", "embedding", k = 4, iters = 0)
    assert(IvfIndex.append(spark, ivfDir, emb.filter($"vec_id" < 0),
      "vec_id", "embedding", 0L))
    assert(IvfIndex.deltaIds(spark, ivfDir) == Seq(0L))
    assert(IvfIndex.topK(spark, ivfDir, emb.filter($"vec_id" <= 10),
      "vec_id", "embedding", k = 3, nprobe = 1).count() > 0)

    val lshDir = tmpDir("graft_lsh_empty")
    LshIndex.build(spark, lshDir, docs, nBuckets = 16)
    // probe with the whole (sf0.001-sized) corpus: the fixture's known
    // near-dup pairs guarantee non-empty matches
    val probe = docs
    val before = LshIndex.matches(spark, lshDir, probe)
      .select($"corpus_id", $"new_id").as[(Long, Long)].collect().toSet
    assert(before.nonEmpty, "probe fixture must produce matches for this test to bite")
    assert(LshIndex.append(spark, lshDir, docs.filter($"doc_id" < 0), 0L))
    // a NON-empty batch of band-less docs (all sub-2-token) must also
    // go marker-only: the guard is on bands(docs), not docs
    val short = Seq((900001L, "one"), (900002L, "")).toDF("doc_id", "text")
    assert(LshIndex.append(spark, lshDir, short, 1L))
    assert(LshIndex.deltaIds(spark, lshDir) == Seq(0L, 1L))
    // probing still works and returns the SAME matches as before the
    // data-less deltas
    val after = LshIndex.matches(spark, lshDir, probe)
      .select($"corpus_id", $"new_id").as[(Long, Long)].collect().toSet
    assert(after == before, "data-less deltas changed probe results")

    // fail-loud: a LIVE delta whose data dir is lost must error, not
    // silently serve partial results
    assert(LshIndex.append(spark, lshDir, docs.filter($"doc_id" < 40), 2L))
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$lshDir/bands_d2"), true)
    val ex = intercept[IllegalArgumentException] {
      LshIndex.matches(spark, lshDir, probe).count()
    }
    assert(ex.getMessage.contains("data dir missing"))

    // corruption: a _DELTA_-prefixed name that isn't a protocol-written
    // marker (an incomplete restore's stray copy) fails with the
    // protocol's actionable message, not a bare NumberFormatException —
    // deltaIds is the one shared scan, so a stray name would otherwise
    // wedge every delta consumer at once with an opaque parse error
    fs.create(new org.apache.hadoop.fs.Path(s"$lshDir/_DELTA_1 (1)"), true).close()
    val stray = intercept[IllegalStateException] {
      LshIndex.deltaIds(spark, lshDir)
    }
    assert(stray.getMessage.contains("unparseable delta marker"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$lshDir/_DELTA_1 (1)"), false)
  }

  test("multimodal bytes → decoded features → persisted ANN index, end to end") {
    // the retrieval pipeline a multimodal training set runs: payloads
    // decoded (stub, real batch shape) into feature vectors, indexed
    // once, served partition-pruned
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
    val feats = Multimodal.decodeFeatures(Multimodal.attach(docs))
      .select($"doc_id".as("vec_id"), $"features".as("embedding"))
    val dir = tmpDir("graft_mm_idx")
    IvfIndex.build(spark, dir, feats, "vec_id", "embedding", k = 4, iters = 1)
    val res = IvfIndex.topK(spark, dir, feats.filter($"vec_id" <= 10),
        "vec_id", "embedding", k = 3, nprobe = 2)
      .select($"vec_id", $"rn", $"nn_id").as[(Long, Int, Long)].collect()
    assert(res.nonEmpty)
    assert(res.forall { case (q, rn, nn) => rn >= 1 && rn <= 3 && q != nn })
    // every query got a full (or cluster-limited) neighbor list, ranked densely
    res.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length).toSeq)
    }
  }

  test("kmeans training improves the IVF index it trains: recall@k >= untrained init") {
    // The trainer exists to build a better coarse quantizer: at the
    // same probe budget, ivfTopK over Lloyd-refined centroids must
    // recall at least as much brute-force truth as over the
    // deterministic first-k init (q_sim_ivf's oracle-replayable
    // time-zero state). Summed over nprobe 1..2 so a single boundary
    // flip can't mask the comparison.
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val truth = Vectors.bruteForceTopK(emb, "vec_id", "embedding", 3)
      .filter($"vec_id" <= 50)
      .select($"vec_id", $"nn_id").as[(Long, Long)].collect().toSet
    def recall(cents: org.apache.spark.sql.DataFrame, nprobe: Int): Double = {
      val got = Vectors.ivfTopK(emb, "vec_id", "embedding", cents, 3, nprobe,
          $"vec_id" <= 50)
        .select($"vec_id", $"nn_id").as[(Long, Long)].collect().toSet
      (truth & got).size.toDouble / truth.size
    }
    val untrained = Vectors.kmeans(emb, "vec_id", "embedding", k = 4, iters = 0)
    val trained = Vectors.kmeans(emb, "vec_id", "embedding", k = 4, iters = 3)
    val (u, t) = (recall(untrained, 1) + recall(untrained, 2),
                  recall(trained, 1) + recall(trained, 2))
    assert(t >= u, s"training LOWERED summed ivf recall: $u -> $t")
  }

  test("Text.search: user query equal to the derived terms replays the oracled BM25 plan") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = Text.tokenStream(docs, "doc_id", "text").cache()
    val dft = Text.docFreq(toks)
    val derived = dft.orderBy($"df".desc, $"term").limit(3)
      .select($"term").as[String].collect().toSeq
    // q_text_search's exact pipeline, with its derived query as the dim
    val want = Text.bm25TopK(toks, dft.orderBy($"df".desc, $"term").limit(3), 10)
      .as[(Long, Double)].collect().toSeq
    // the serving path, given the same terms as a user query string
    val got = Text.search(docs, "doc_id", "text", derived.mkString(" "), 10)
      .as[(Long, Double)].collect().toSeq
    assert(got == want, "Text.search diverged from the oracled BM25 pipeline")
    assert(got.size == 10)

    // terms the corpus never saw have empty postings — no rows, no error
    assert(Text.search(docs, "doc_id", "text", "zzz_no_such_token_zzz", 5).count() == 0)
    // k caps the result; duplicate words in the query string are one term
    val dup = Text.search(docs, "doc_id", "text",
      s"${derived.head} ${derived.head}", 3).as[(Long, Double)].collect().toSeq
    val single = Text.search(docs, "doc_id", "text", derived.head, 3)
      .as[(Long, Double)].collect().toSeq
    assert(dup == single && dup.size == 3)

    // duplicate (term, df) ROWS in the query dim itself must not
    // double-count tf or emit duplicate fold entries (bm25TopK dedups
    // on term internally)
    val qdim = dft.orderBy($"df".desc, $"term").limit(3)
    val dupRows = Text.bm25TopK(toks, qdim.union(qdim), 10)
      .as[(Long, Double)].collect().toSeq
    assert(dupRows == want, "duplicate qterm rows changed bm25TopK scores")
  }

  test("pqCodebookTrained: iters=0 is the sampled init; Lloyd cuts distortion monotonically") {
    import org.apache.spark.sql.functions._
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val coded = emb.repartition(8)
      .select($"vec_id", $"embedding".as("v"))
      .withColumn("nrm", Vectors.norm($"v"))
      .withColumn("qc", Vectors.sq8($"v", $"nrm"))
      .select($"vec_id", $"qc").cache()
    try {
      // iters=0 degrades to pqCodebook exactly (the oracled-query rung)
      assert(Vectors.pqCodebookTrained(coded, "vec_id", "qc", 16, 32, 0) ==
        Vectors.pqCodebook(coded, "vec_id", "qc", 16, 32))
      // the training objective: exact-integer distortion, so the
      // monotone non-increase is a hard gate, not a tolerance
      // (measured 2493176 -> 2003966 -> 1869493 on this corpus)
      val d = (0 to 2).map(it => Vectors.pqDistortion(coded, "qc",
        Vectors.pqCodebookTrained(coded, "vec_id", "qc", 16, 32, it)))
      assert(d(1) < d(0), s"first Lloyd iteration did not cut distortion: $d")
      assert(d(2) <= d(1), s"distortion increased on iteration 2: $d")
    } finally coded.unpersist()
  }

  test("semanticGroups: iters=0 replays the oracled query; training cuts candidate pairs; k rule is linear") {
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")

    // (1) the production API at iters=0 IS the oracled q_dedup_semantic
    // pipeline: kmeans' deterministic first-k init == the query's
    // vec_id < 8 centroid set, so groups must agree exactly
    val api = Vectors.semanticGroups(emb, "vec_id", "embedding",
        threshold = 0.2, k = 8, iters = 0)
      .as[(Long, Long)].collect().toSet
    val cents0 = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("c_id"), $"embedding".as("cv"))
    val queryPath = graft.ops.Components.connectedComponents(
        emb.select($"vec_id"),
        Vectors.semanticPairs(emb, "vec_id", "embedding", cents0, 0.2))
      .as[(Long, Long)].collect().toSet
    assert(api == queryPath, "semanticGroups(iters=0) diverged from the oracled pipeline")

    // (2) the scale gate: with a TRAINED quantizer the in-cluster
    // pairwise-work bound Σ n_c·(n_c−1)/2 must sit near the balanced
    // n²/2k floor (this is the constant the 100 TB story rests on) and
    // must not exceed the untrained init's bound by more than noise —
    // on this fixture the first-8 init is already near-balanced
    // (measured within 1% of the floor), so "reduce" is vacuous; the
    // quality side training buys is lower inertia, gated below
    val untrained = Vectors.kmeans(emb, "vec_id", "embedding", k = 8, iters = 0)
    val trained = Vectors.kmeans(emb, "vec_id", "embedding", k = 8, iters = 3)
    val pu = Vectors.semanticCandidatePairs(emb, "vec_id", "embedding", untrained)
    val pt = Vectors.semanticCandidatePairs(emb, "vec_id", "embedding", trained)
    val n = emb.count()
    val balanced = n.toDouble * n / (2 * 8)
    assert(pt <= balanced * 1.25, s"trained pair bound $pt blew the n²/2k floor $balanced")
    assert(pt <= pu * 1.10, s"training blew up candidate pairs: $pu -> $pt")
    val iu = Vectors.inertia(emb, "vec_id", "embedding", untrained)
    val it = Vectors.inertia(emb, "vec_id", "embedding", trained)
    assert(it < iu, s"training did not sharpen clusters: inertia $iu -> $it")

    // (3) raising k must cut candidate pairs (more, smaller clusters)
    val trained32 = Vectors.kmeans(emb, "vec_id", "embedding", k = 32, iters = 3)
    val pt32 = Vectors.semanticCandidatePairs(emb, "vec_id", "embedding", trained32)
    assert(pt32 < pt, s"k=32 did not cut pairs vs k=8: $pt -> $pt32")

    // (4) the corpus-scale k rule keeps expected cluster size at target:
    // k = ceil(n/target) — linear in n, never 0
    assert(Vectors.semanticK(500, 1024) == 1)
    assert(Vectors.semanticK(1024 * 1024, 1024) == 1024)
    assert(Vectors.semanticK(100_000_000L, 1024) == 97657)
    assert(Vectors.semanticK(0, 1024) == 1)
  }

  test("kmeans: Lloyd iterations never increase inertia; assignment is argmax") {
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val init = Vectors.kmeans(emb, "vec_id", "embedding", k = 4, iters = 0)
    val i0 = Vectors.inertia(emb, "vec_id", "embedding", init)
    val c1 = Vectors.kmeans(emb, "vec_id", "embedding", k = 4, iters = 1)
    val i1 = Vectors.inertia(emb, "vec_id", "embedding", c1)
    val c3 = Vectors.kmeans(emb, "vec_id", "embedding", k = 4, iters = 3)
    val i3 = Vectors.inertia(emb, "vec_id", "embedding", c3)
    assert(i1 <= i0 + 1e-12, s"iter 1 raised inertia: $i0 -> $i1")
    assert(i3 <= i1 + 1e-12, s"iter 3 raised inertia: $i1 -> $i3")
    assert(i3 < i0, s"training did nothing: $i0 -> $i3")

    // assignment optimality: the chosen centroid's cosine is the max
    // over ALL centroids for every vector
    val assigned = Vectors.assignToCentroids(emb, "vec_id", "embedding", c3)
      .select($"vec_id", $"cluster", $"cos")
    val best = Vectors.assignToCentroids(emb, "vec_id", "embedding", c3)
      .select($"vec_id".as("v2"), $"cos".as("best"))
    val all = emb.select($"vec_id".as("v3"), $"embedding".as("v"))
      .withColumn("nrm", Vectors.norm($"v"))
      .join(broadcast(c3.select($"c_id", $"cv", Vectors.norm($"cv").as("cnrm"))))
      .withColumn("c", Vectors.cosine($"v", $"cv", $"nrm", $"cnrm"))
      .groupBy($"v3").agg(max($"c").as("maxc"))
    val joined = assigned.join(all, $"vec_id" === $"v3")
      .select($"vec_id", $"cos", $"maxc").as[(Long, Double, Double)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (id, cos, maxc) =>
      assert(math.abs(cos - maxc) < 1e-12, s"vec $id assigned $cos but max is $maxc")
    }
  }

  test("powerIterate: converges to the dominant eigen-direction, exactly replayable") {
    // G = diag-dominant 2x2 with known dominant eigenvector ~ (2, 1):
    // [[8, 4], [4, 5]] has eigenvector (2, 1) for eigenvalue 10 exactly
    // (8*2+4*1=20=10*2; 4*2+5*1=13... not exact — use a true eigenpair:
    // [[7, 6], [3, 4]] · (2,1) = (20, 10) = 10·(2,1)).
    val g = Map((0, 0) -> 7L, (0, 1) -> 6L, (1, 0) -> 3L, (1, 1) -> 4L)
    val v = Vectors.powerIterate(g, 2, iters = 6)
    // only the DIRECTION is promised: ratio within integer-rescale error
    val ratio = v(0).toDouble / v(1).toDouble
    assert(math.abs(ratio - 2.0) < 1e-3, s"direction off: ${v.toSeq} ratio $ratio")
    // bit-exact replay: same inputs, same iterate
    assert(Vectors.powerIterate(g, 2, iters = 6).toSeq == v.toSeq)
  }

  test("rpMatrix: md5-pinned entries, balanced rows, deterministic") {
    val m = Vectors.rpMatrix(32, 64)
    assert(m.length == 32 && m.forall(_.length == 64))
    assert(m.flatten.forall(x => x == 1L || x == -1L))
    // pin two cells to the md5 definition so a silent generator change
    // (the round-14 recall-collapse failure mode) breaks loudly:
    // md5("rp:0:0") = 63... ('6' even → +1), md5("rp:15:63") = 59...
    // ('5' odd → -1)
    assert(m(0)(0) == 1L)
    assert(m(15)(63) == -1L)
    // rows are hash-balanced, not degenerate (a correlated/constant row
    // was the 0.15-recall bug): every row mixes both signs substantially
    m.foreach { row =>
      val pos = row.count(_ == 1L)
      assert(pos >= 16 && pos <= 48, s"unbalanced row: $pos of 64 positive")
    }
    assert(Vectors.rpMatrix(32, 64) == m)
  }
}
