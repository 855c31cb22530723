package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Distributed connected components vs a sequential union-find oracle
  * on random graphs — the propagation loop, convergence test, and
  * undirected-edge handling all have to agree with the textbook
  * answer on every generated topology (chains, stars, cliques,
  * singletons, self-loops, duplicate edges all arise at these sizes).
  * Spark-backed, so the case count is capped.
  */
object ComponentsProps extends Properties("Components") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.functions.GraftExtensions)
    .getOrCreate()

  private val genGraph: Gen[(Int, List[(Long, Long)])] = for {
    n <- Gen.choose(1, 24)
    m <- Gen.choose(0, 40)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n - 1L)
      b <- Gen.choose(0L, n - 1L)
    } yield (a, b))
  } yield (n, edges)

  private def unionFind(n: Int, edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  property("labels equal union-find component minima") = forAll(genGraph) {
    case (n, edges) =>
      import spark.implicits._
      val nodes = (0L until n.toLong).toDF("id")
      val pairs = edges match {
        case Nil => Seq.empty[(Long, Long)].toDF("a", "b")
        case es  => es.toDF("a", "b")
      }
      val got = Components.connectedComponents(nodes, pairs)
        .as[(Long, Long)].collect().toMap
      got == unionFind(n, edges)
  }

  property("star variant labels equal union-find component minima") = forAll(genGraph) {
    case (n, edges) =>
      import spark.implicits._
      val nodes = (0L until n.toLong).toDF("id")
      val pairs = edges match {
        case Nil => Seq.empty[(Long, Long)].toDF("a", "b")
        case es  => es.toDF("a", "b")
      }
      val got = Components.connectedComponentsStar(nodes, pairs)
        .as[(Long, Long)].collect().toMap
      got == unionFind(n, edges)
  }

  property("round-halving: a 200-hop chain converges where one-hop propagation cannot") =
    org.scalacheck.Prop {
      import spark.implicits._
      val nodes = (0L until 200L).toDF("id")
      val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
      // one-hop min propagation needs diameter (199) rounds — 12 must throw
      val threw = try {
        Components.connectedComponents(nodes, chain, maxRounds = 12); false
      } catch { case _: IllegalStateException => true }
      // the star alternation halves depth per round — 12 suffice
      val star = Components.connectedComponentsStar(nodes, chain, maxRounds = 12)
        .as[(Long, Long)].collect()
      threw && star.forall(_._2 == 0L)
    }

  property("non-convergence within maxRounds fails loudly, never silently wrong") =
    org.scalacheck.Prop {
      import spark.implicits._
      // a 12-node chain has diameter 11 > 3 rounds of one-hop min-propagation
      val nodes = (0L until 12L).toDF("id")
      val chain = (0L until 11L).map(i => (i, i + 1)).toDF("a", "b")
      val threw = try {
        Components.connectedComponents(nodes, chain, maxRounds = 3); false
      } catch { case _: IllegalStateException => true }
      val fine = Components.connectedComponents(nodes, chain, maxRounds = 20)
        .as[(Long, Long)].collect().forall(_._2 == 0L)
      threw && fine
    }

  // mergeBatch must be indistinguishable from a full recompute on every
  // topology: the random graphs cover batch edges bridging two existing
  // components, a new id (0 ≡ 0 mod 3) becoming its merged component's
  // new minimum, isolated new nodes, and an empty base (n = 1).
  property("mergeBatch on a mod-3 split equals full recompute") = forAll(genGraph) {
    case (n, edges) =>
      import spark.implicits._
      val all = 0L until n.toLong
      def ndf(xs: Seq[Long]) = xs match {
        case Nil => Seq.empty[Long].toDF("id"); case s => s.toDF("id")
      }
      def edf(es: List[(Long, Long)]) = es match {
        case Nil => Seq.empty[(Long, Long)].toDF("a", "b"); case s => s.toDF("a", "b")
      }
      val baseEdges = edges.filter { case (a, b) => a % 3 != 0 && b % 3 != 0 }
      val state0 = Components.connectedComponents(
        ndf(all.filter(_ % 3 != 0)), edf(baseEdges))
      val got = Components.mergeBatch(state0,
          ndf(all.filter(_ % 3 == 0)), edf(edges.diff(baseEdges)))
        .as[(Long, Long)].collect()
      got.length == n && got.toMap == unionFind(n, edges)
  }
}
