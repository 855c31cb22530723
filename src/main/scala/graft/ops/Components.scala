package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation — the
  * clustering core behind q_dedup_cluster (near-dup pair graph →
  * duplicate clusters), usable over any undirected edge list.
  *
  * Each round is one join of the edge set against the current labels
  * plus one min-aggregation — pure shuffle-parallel work, no driver
  * data. Rounds = component diameter; near-dup graphs are
  * small-diameter, and the documented upgrade for deep components at
  * 100 TB is the large-star/small-star round-halving variant
  * ("Connected Components in MapReduce and Beyond", Kiveris et al.
  * 2014). Per-round localCheckpoint truncates the lineage (iterative
  * plans otherwise grow exponentially in the optimizer); convergence
  * is detected with a 1-row sum aggregate (labels only ever decrease,
  * so an unchanged sum == fixpoint — no per-row diff join).
  */
object Components {

  /** Label every node with the smallest node id reachable from it.
    *
    * @param nodes single-column DF of node ids (long)
    * @param pairs two-column DF of undirected edges (long, long)
    * @return (id, lab) DF — lab = min id of the node's component
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
                          maxRounds: Int = 50): DataFrame = {
    val Seq(na) = nodes.columns.toSeq.take(1)
    val Seq(ea, eb) = pairs.columns.toSeq.take(2)
    // undirected: propagate min labels both ways along each edge
    val edges = pairs.select(col(ea), col(eb))
      .union(pairs.select(col(eb), col(ea)))
      .toDF("src", "dst").localCheckpoint()
    // r21 (guide §1): the convergence sum rides the SAME action as the
    // per-round checkpoint via `observe` — the loop previously paid two
    // actions per round (materialize, then a separate agg job over the
    // materialized labels); the observed metric is computed during the
    // checkpoint job for free. coalesce: sum over an EMPTY node set is
    // null — 0 keeps the fixpoint test well-defined (empty in, empty
    // out, one round).
    def checkpointWithSum(df: DataFrame, name: String): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation(name)
      val cp = df.observe(obs, coalesce(sum(col("lab")), lit(0L)).as("s"))
        .localCheckpoint()
      (cp, obs.get("s").asInstanceOf[Long])
    }
    var (labels, prevSum) =
      checkpointWithSum(nodes.select(col(na).as("id"), col(na).as("lab")), "cc_init")
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val prop = edges.join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("lab"))
      val (next, cur) = checkpointWithSum(
        labels.union(prop).groupBy(col("id")).agg(min(col("lab")).as("lab")),
        s"cc_round_$rounds")
      labels = next
      converged = cur == prevSum
      prevSum = cur
      rounds += 1
    }
    // a silent non-converged return would hand back WRONG labels (a
    // >maxRounds-diameter chain still mid-propagation) — fail loudly;
    // the caller raises maxRounds or switches to the round-halving
    // large-star/small-star variant
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge in $maxRounds rounds — " +
        "component diameter exceeds the bound; raise maxRounds or use " +
        "connectedComponentsStar (Kiveris et al. 2014)")
    labels
  }

  /** Round-halving connected components — the alternating
    * large-star/small-star algorithm of "Connected Components in
    * MapReduce and Beyond" (Kiveris et al., SoCC 2014): rounds grow
    * with log(diameter), not diameter, so a 10^6-hop chain converges
    * in ~tens of alternations where one-hop propagation needs 10^6.
    * This is the deep-component path; [[connectedComponents]] stays
    * the cheaper-per-round choice for the small-diameter graphs
    * near-dup pairs produce.
    *
    * large-star: every node's strictly-larger neighbors re-attach to
    * its neighborhood minimum; small-star: every node and its
    * smaller-or-equal neighbors re-attach likewise. Each half-step is
    * a groupBy + join + distinct (3 shuffles), all edge-parallel, no
    * driver data. Fixpoint = the edge multiset stops changing (exact
    * count + one-sided exceptAll — labels aren't monotone here, so the
    * propagation loop's sum trick doesn't apply); at fixpoint the edge
    * set IS the star forest (v → component min), read off as labels.
    */
  def connectedComponentsStar(nodes: DataFrame, pairs: DataFrame,
                              maxRounds: Int = 30): DataFrame = {
    val Seq(na) = nodes.columns.toSeq.take(1)
    val Seq(ea, eb) = pairs.columns.toSeq.take(2)

    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.union(e.select(col("v"), col("u"))).toDF("u", "v")
      val mins = nbrs.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      nbrs.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e
        .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
      val mins = oriented.groupBy("u").agg(min(col("v")).as("m"))
      oriented.join(mins, "u")
        .select(explode(array(
          struct(col("v").as("a"), col("m").as("b")),
          struct(col("u").as("a"), col("m").as("b")))).as("p"))
        .select(col("p.a").as("u"), col("p.b").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // convergence: a cheap multiset fingerprint (count + component
    // sums) screens each round in one agg; only when it stabilizes is
    // the exact exceptAll confirmation run — a hash collision merely
    // costs one extra confirmation, never a wrong early stop
    def fingerprint(e: DataFrame): Seq[Long] =
      e.agg(count(lit(1)), coalesce(sum(col("u")), lit(0L)),
          coalesce(sum(col("v")), lit(0L)),
          coalesce(sum(pmod(col("u") * 31 + col("v"), lit(1000000007L))), lit(0L)))
        .head().toSeq.map(v => v.asInstanceOf[Long])
    var edges = pairs.select(col(ea).as("u"), col(eb).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    var prevFp = fingerprint(edges)
    var converged = prevFp.head == 0L
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      val fp = fingerprint(next)
      converged = fp == prevFp && next.exceptAll(edges).isEmpty
      prevFp = fp
      edges = next
      rounds += 1
    }
    if (!converged) throw new IllegalStateException(
      s"star components did not converge in $maxRounds rounds")
    // fixpoint edges form the star forest: u → its component min;
    // isolated nodes label themselves
    nodes.select(col(na).as("id"))
      .join(edges.select(col("u").as("id"), col("v").as("star")), Seq("id"), "left")
      .select(col("id"), coalesce(col("star"), col("id")).as("lab"))
  }

  /** Incrementally merge one ingest batch (new nodes + new edges) into
    * an existing min-label assignment — the 100 TB maintenance path for
    * duplicate clustering: a full recompute rescans the corpus graph
    * every batch, while this touches only batch-sized state.
    *
    * The trick is the CONDENSED graph: because every label is its
    * component's MINIMUM id, an entire existing component can stand in
    * as the single node `lab` — min(labels ∪ new ids) over a merged
    * group equals min(all member ids ∪ new ids), so connected
    * components over {touched labels + new ids} with each new edge
    * lifted to its endpoints' labels yields exactly the labels a full
    * recompute would. Work per batch: one label lookup join for the
    * edge endpoints (point lookups — pruned, not a corpus scan, when
    * the state table is bucketed by id), CC over the batch-sized
    * condensed graph, and one NARROW relabel pass of the state against
    * the broadcast rename map (no shuffle of the state; at 100 TB,
    * rewrite only the buckets holding renamed labels).
    *
    * @param state    (id, lab) assignment with lab = component min id
    * @param newNodes single-column DF of new node ids (may be empty)
    * @param newEdges two-column DF of new undirected edges; endpoints
    *                 may be old ids, new ids, or ids never seen (which
    *                 label themselves)
    * @return updated (id, lab) assignment, bit-equal to a full
    *         recompute over the union graph
    */
  def mergeBatch(state: DataFrame, newNodes: DataFrame,
                 newEdges: DataFrame): DataFrame = {
    val st = state.select(col(state.columns(0)).as("id"),
      col(state.columns(1)).as("lab"))
    val nn = newNodes.select(col(newNodes.columns(0)).as("id")).distinct()
    val Seq(ea, eb) = newEdges.columns.toSeq.take(2)
    val e = newEdges.select(col(ea).as("u"), col(eb).as("v"))
    // batch edge endpoints resolved to their current labels (unseen
    // ids label themselves)
    val ends = e.select(col("u").as("id")).union(e.select(col("v").as("id")))
      .distinct()
    val endLabs = ends.join(st, Seq("id"), "left")
      .select(col("id"), coalesce(col("lab"), col("id")).as("lab"))
      .localCheckpoint()
    // condensed graph: touched labels + all new ids as nodes, batch
    // edges lifted to label space
    val lifted = e
      .join(endLabs.select(col("id").as("u"), col("lab").as("lu")), "u")
      .join(endLabs.select(col("id").as("v"), col("lab").as("lv")), "v")
      .select(col("lu"), col("lv"))
    val condNodes = endLabs.select(col("lab").as("id"))
      .union(nn).distinct()
    val cond = connectedComponents(condNodes, lifted).localCheckpoint()
    // rename map: only labels that actually change ride the broadcast
    val ren = cond.filter(col("id") =!= col("lab"))
      .select(col("id").as("lab"), col("lab").as("nl"))
    val updated = st.join(broadcast(ren), Seq("lab"), "left")
      .select(col("id"), coalesce(col("nl"), col("lab")).as("lab"))
    // assignments for genuinely new ids (cond also carries old labels,
    // but those can never collide with ids absent from the state)
    val newAssign = nn.join(st.select(col("id")), Seq("id"), "left_anti")
      .join(broadcast(cond.withColumnRenamed("lab", "nl")), Seq("id"), "left")
      .select(col("id"), coalesce(col("nl"), col("id")).as("lab"))
    updated.union(newAssign)
  }
}
