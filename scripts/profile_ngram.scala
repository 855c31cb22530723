import org.apache.spark.sql.functions._
import graft.ops.Text
import graft.tables.Tables

val dir = "/root/testdata/sf0.1"
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
def fanout(df: org.apache.spark.sql.DataFrame) = df.repartition(32)

val sh = fanout(Tables.documents(spark, dir).filter(size(split(col("text"), " ")) >= 2)).withColumn("toks", Text.tokens(col("text"))).select(col("doc_id"), array_distinct(Text.shingles(col("toks"), 2)).as("sh"))
val banded = sh.withColumn("md5s", transform(col("sh"), x => md5(x))).withColumn("sig", Text.minhashSignatureFromMd5s(col("md5s"), 6)).select(col("doc_id"), explode_outer(Text.lshBands(col("sig"), 3, 2)).as("band")).filter(col("band").isNotNull)
time("banded warm1")(banded.count())
time("banded warm2")(banded.count())
val cand = banded.groupBy(col("band")).agg(sort_array(collect_list(col("doc_id"))).as("ids")).filter(size(col("ids")) > 1).select(explode(expr("flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), y -> struct(x AS id_a, y AS id_b))))")).as("p")).select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b")).distinct()
time("cand")(cand.count())
val full = cand.join(sh.select(col("doc_id").as("id_a"), col("sh").as("sha")), "id_a").join(sh.select(col("doc_id").as("id_b"), col("sh").as("shb")), "id_b").withColumn("jac", Text.jaccard(col("sha"), col("shb"))).filter(col("jac") >= 0.5)
time("full")(full.count())
time("full2")(full.count())
System.exit(0)
