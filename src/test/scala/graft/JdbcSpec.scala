package graft

import java.sql.DriverManager

import graft.sources.{JdbcPartitioning, JdbcSource}

/** End-to-end JDBC scans against a REAL embedded DBMS (Apache Derby,
  * which ships with Spark) — upgrading S1 from option-wiring unit
  * tests to an actual driver-loaded, SQL-executing read path, offline. */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE events (id BIGINT PRIMARY KEY, etype VARCHAR(20), val DOUBLE)")
    (0 until 100).foreach(i =>
      st.execute(s"INSERT INTO events VALUES ($i, 'type${i % 3}', ${i * 1.5})"))
    st.close(); conn.close()
  }

  test("JdbcSource: single-connection scan reads all rows") {
    seeded
    val df = JdbcSource(url, "events", driver).read(spark)
    assert(df.count() === 100)
    assert(df.columns.map(_.toLowerCase).toSeq === Seq("id", "etype", "val"))
  }

  test("JdbcSource: partitioned read splits the scan, same data") {
    seeded
    val df = JdbcSource(url, "events", driver,
      partitioning = Some(JdbcPartitioning("id", 0, 100, 4))).read(spark)
    assert(df.rdd.getNumPartitions === 4) // 4 parallel connections
    assert(df.count() === 100)
    // pushdown through JDBC: the predicate travels to the DBMS
    assert(df.filter(df("etype") === "type1").count() === 33)
  }
}
