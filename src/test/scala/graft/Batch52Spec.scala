package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{CypherSink, InMemoryBolt}

/** Batch 52: the Cypher MERGE sink round-trip — statement rendering,
  * F12 temporal component maps, constraint-gated batched UNWIND
  * writes, and MERGE idempotence (writing the same graph twice must
  * leave the store unchanged — the property the reference relies on
  * for its re-runnable projectors).
  */
class Batch52Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def graph = {
    val ts = Timestamp.valueOf("2024-03-05 10:20:30")
    val v = Seq(
      (10L, "Station", "st-a", ts),
      (11L, "Station", "st-b", ts),
      (20L, "WeatherDay", "wd-1", Timestamp.valueOf("2024-03-06 00:00:00"))
    ).toDF("id", "label", "name", "observed_at")
    val e = Seq((10L, 20L, "HAS_WEATHER_DAY"), (11L, 20L, "HAS_WEATHER_DAY"))
      .toDF("src", "dst", "rel")
    (v, e)
  }

  test("datetimeParams matches the reference component-map encoding") {
    val micros = Timestamp.valueOf("2024-03-05 10:20:30").toInstant
      .getEpochSecond * 1000000L
    val p = CypherSink.datetimeParams(micros, Some("+03:00"))
    assert(p == Map("year" -> 2024, "month" -> 3, "day" -> 5,
      "hour" -> 10, "minute" -> 20, "second" -> 30, "timezone" -> "+03:00"))
    assert(!CypherSink.datetimeParams(micros).contains("timezone"),
      "offset only when supplied, like ensure_datetime_param")
  }

  test("statement rendering: constraint DDL, vertex and edge UNWIND MERGE") {
    val ddl = CypherSink.constraintDdl("WeatherDay", Seq("station_serial", "date"))
    assert(ddl.contains("CREATE CONSTRAINT weatherday_unique IF NOT EXISTS"))
    assert(ddl.contains("(n.`station_serial`, n.`date`) IS UNIQUE"))
    val v = CypherSink.mergeVerticesCypher("Station", Seq("id"),
      Seq("id", "name"))
    assert(v.contains("UNWIND $rows AS r") &&
      v.contains("MERGE (n:`Station` { `id`: r.`id` })") &&
      v.contains("SET n.`name` = r.`name`"))
    val e = CypherSink.mergeEdgesCypher("HAS", "A", "id", "B", "id")
    assert(e.contains("MATCH (s:`A`") && e.contains("MERGE (s)-[:`HAS`]->(d)"))
    assertThrows[IllegalArgumentException](
      CypherSink.sanitizeIdent("bad`tick"))
  }

  test("writeGraph: gated, batched, idempotent MERGE round-trip") {
    val (v, e) = graph
    val token = "spec_roundtrip"
    InMemoryBolt.drop(token)
    val f = InMemoryBolt.Factory(token)
    val (nv, ne) = CypherSink.writeGraph(v, e, f, batchSize = 2)
    assert((nv, ne) == (3L, 2L))
    val s = InMemoryBolt.store(token)
    assert(s.nodes.size == 3 && s.edges.size == 2)
    assert(s.constraints.exists(_.contains("station_unique")) &&
      s.constraints.exists(_.contains("weatherday_unique")))
    // F12: the timestamp prop landed as the component map
    val wd = s.nodes(("WeatherDay", 20L))("observed_at")
      .asInstanceOf[Map[String, Any]]
    assert(wd("year") == 2024 && wd("month") == 3 && wd("day") == 6)
    // idempotence: MERGE again, nothing grows
    val (nv2, ne2) = CypherSink.writeGraph(v, e, f, batchSize = 2)
    assert((nv2, ne2) == (3L, 2L))
    assert(s.nodes.size == 3 && s.edges.size == 2,
      "second MERGE pass must not create anything")
    InMemoryBolt.drop(token)
  }

  test("writeGraph refuses dangling edges and duplicate ids before writing") {
    val (v, e) = graph
    val dangling = e.union(Seq((99L, 20L, "HAS_WEATHER_DAY")).toDF("src", "dst", "rel"))
    val token = "spec_gate"
    InMemoryBolt.drop(token)
    val f = InMemoryBolt.Factory(token)
    assertThrows[IllegalArgumentException](CypherSink.writeGraph(v, dangling, f))
    assert(InMemoryBolt.store(token).nodes.isEmpty,
      "failed gate must leave no partial writes")
    val dup = v.union(v.limit(1))
    assertThrows[IllegalArgumentException](CypherSink.writeGraph(dup, e, f))
    InMemoryBolt.drop(token)
  }
}
