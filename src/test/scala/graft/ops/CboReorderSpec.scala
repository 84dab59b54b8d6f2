package graft.ops

import graft.SparkTestBase

/** Pins the last Catalyst feature class the engine relies on but never
  * exercised deliberately (r14 verdict task 6): cost-based join
  * reordering from ANALYZE'd table/column statistics. Path-based
  * parquet reads carry no catalog stats, so the fixture tables are
  * registered as external catalog tables, ANALYZE ... FOR ALL COLUMNS
  * computes row counts + NDVs, and the TPC-H Q5 join shape (written in
  * a deliberately bad FROM order: fact table first, dims last) is
  * optimized with CBO off vs on. The pin: with stats + joinReorder the
  * optimizer produces a DIFFERENT join tree that pulls a selective dim
  * below the fact joins. At execution time AQE still re-plans
  * broadcast sides from runtime sizes — CBO decides the ORDER, AQE the
  * STRATEGY; the declared TPC-H queries lean on AQE alone because
  * their DataFrame join order is already hand-chosen, which is why
  * this spec is the deliberate exercise. */
class CboReorderSpec extends SparkTestBase {

  private def leafOrder(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] =
    plan.collectLeaves().map {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.catalogTable.map(_.identifier.table).getOrElse("path")
      case other => other.nodeName
    }

  test("ANALYZE'd stats + cbo.joinReorder re-order the Q5 join tree") {
    val tables = Seq("customer", "orders", "lineitem", "supplier",
      "nation", "region")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_cbo")
    for (t <- tables) {
      spark.sql(s"DROP TABLE IF EXISTS graft_cbo.$t")
      spark.sql(s"CREATE TABLE graft_cbo.$t USING parquet " +
        s"LOCATION '$sf0001/$t.parquet'")
      spark.sql(s"ANALYZE TABLE graft_cbo.$t COMPUTE STATISTICS " +
        "FOR ALL COLUMNS")
    }
    // row counts made it into the catalog
    val liStats = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        "lineitem", Some("graft_cbo"))).stats
    assert(liStats.exists(_.rowCount.exists(_.toLong > 0L)),
      "ANALYZE left no row count in the catalog")

    // Q5 shape, FROM-ordered worst-first (fact first, selective dims
    // last). Deliberately NO predicate on o_orderdate: the fixture
    // stores it as TIMESTAMP_NTZ and Spark 4.1's FilterEstimation
    // throws scala.MatchError(TimestampNTZType) when CBO estimates a
    // range predicate on that type — a real engine limitation this
    // spec documents: with CBO on, keep NTZ-typed predicates out of
    // stats-estimated filters (or cast the column at ingest).
    val q5 =
      """SELECT n_name,
        |  SUM(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(14,2)))) AS revenue
        |FROM graft_cbo.lineitem
        |JOIN graft_cbo.orders ON l_orderkey = o_orderkey
        |JOIN graft_cbo.customer ON o_custkey = c_custkey
        |JOIN graft_cbo.supplier
        |  ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN graft_cbo.nation ON s_nationkey = n_nationkey
        |JOIN graft_cbo.region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderstatus = 'F'
        |GROUP BY n_name""".stripMargin

    def orderWith(cbo: Boolean): Seq[String] = {
      spark.conf.set("spark.sql.cbo.enabled", cbo)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", cbo)
      try leafOrder(spark.sql(q5).queryExecution.optimizedPlan)
      finally {
        spark.conf.set("spark.sql.cbo.enabled", false)
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", false)
      }
    }

    val off = orderWith(cbo = false)
    val on = orderWith(cbo = true)
    assert(off.toSet === on.toSet, s"lost a relation: off=$off on=$on")
    assert(off !== on,
      s"stats-driven reorder did not engage: both plans read $off")
    // the reorder's point: at least one dim that trailed in the
    // syntactic order moved earlier in the stats-driven tree
    assert(Seq("region", "nation", "supplier", "customer")
      .exists(d => on.indexOf(d) < off.indexOf(d)),
      s"no dim moved earlier: off=$off on=$on")

    // same rows either way (reorder is a pure optimization)
    spark.conf.set("spark.sql.cbo.enabled", true)
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", true)
    val withCbo = spark.sql(q5).collect().map(_.toString).sorted
    spark.conf.set("spark.sql.cbo.enabled", false)
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", false)
    val withoutCbo = spark.sql(q5).collect().map(_.toString).sorted
    assert(withCbo.sameElements(withoutCbo))
  }
}
