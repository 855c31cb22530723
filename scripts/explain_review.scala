import graft.queries.GQuery

val dir = "/root/testdata/sf0.1"
val interesting = Seq("q_scan_project", "q_filter_pred", "q_join_broadcast", "q_join_asof",
  "q_agg_hash", "q_sort_limit", "q_cdc_upsert_snapshot", "q_join_inner", "q_topk")
for (name <- interesting) {
  val df = GQuery.all.find(_.name == name).get.fn(spark, dir)
  val plan = df.queryExecution.executedPlan.treeString
  val exchanges = plan.split("\n").count(_.contains("Exchange"))
  val bhj = plan.split("\n").count(_.contains("BroadcastHashJoin"))
  val smj = plan.split("\n").count(_.contains("SortMergeJoin"))
  val wsc = plan.split("\n").count(_.trim.startsWith("*"))
  println(s"== $name: exchanges=$exchanges bhj=$bhj smj=$smj codegen_nodes=$wsc")
  plan.split("\n").filter(l => l.contains("PushedFilters") || l.contains("ReadSchema") || l.contains("TakeOrdered")).foreach(l => println("   " + l.trim.take(200)))
}
System.exit(0)
