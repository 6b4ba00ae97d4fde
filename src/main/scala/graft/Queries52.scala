package graft

import org.apache.spark.sql.functions._

import Queries.Q

/** Batch 52 (round 9): the Cypher sink through the REAL Bolt wire
  * protocol. `g_cypher_sink` proves the write path against the
  * in-memory interpreter; this twin routes the identical writeGraph
  * call through [[graft.sinks.bolt.BoltSocketSessionFactory]] — TCP
  * handshake, 5.0 version negotiation, chunked PackStream framing,
  * HELLO/RUN/PULL — into an in-process loopback server
  * ([[graft.sinks.bolt.BoltLoopbackServer]]) that interprets the
  * statements with the same MERGE semantics. Every layer short of a
  * remote Neo4j endpoint (the reference's terminal artifact,
  * app/neo4j_pool.py:6-19) is the production one, including one real
  * socket per partition task — so this entry is also a throughput
  * measurement of the wire encoding under executor parallelism.
  */
object Queries52 {

  /** Same oracle-checked counts as `g_cypher_sink` — per-label nodes,
    * per-rel edges, and the 4-label constraints row — but read from a
    * store every row of which crossed a genuine TCP socket
    * ([[Queries51.storeCounts]] is the shared output shape).
    */
  val g_cypher_sink_tcp = Q(
    (s, dir) => {
      import graft.sinks.InMemoryBolt
      import graft.sinks.bolt.{BoltLoopbackServer, BoltSocketSessionFactory}
      val (verts, edges) = Queries51.sinkFixtureGraph(s, dir)
      val token = s"g_cypher_sink_tcp_${graft.sources.Staging.dirKey(dir)}" +
        s"_${Queries51.sinkNonce.incrementAndGet()}"
      val srv = new BoltLoopbackServer(token)
      try {
        graft.sinks.CypherSink.writeGraph(verts, edges,
          BoltSocketSessionFactory(srv.host, srv.port), batchSize = 1000)
        Queries51.storeCounts(s, InMemoryBolt.store(token))
      } finally { srv.close(); InMemoryBolt.drop(token) }
    },
    // identical truth to g_cypher_sink: the transport must not change
    // what lands in the store
    Queries51.g_cypher_sink.oracle)

  /** The wire sink under injected FAULTS: the loopback server
    * transient-fails the FIRST delivery of every distinct statement
    * (without applying it) and the factory retries on a fresh
    * connection — the oracle-checked counts prove the redelivered
    * batches land EXACTLY ONCE, the idempotence property that makes
    * the reference's projectors safely re-runnable and this sink safe
    * to retry at 1000-executor scale where transient network errors
    * are the norm, not the exception.
    */
  val g_cypher_sink_resilient = Q(
    (s, dir) => {
      import graft.sinks.InMemoryBolt
      import graft.sinks.bolt.{BoltLoopbackServer, BoltSocketSessionFactory}
      val (verts, edges) = Queries51.sinkFixtureGraph(s, dir)
      val token = s"g_cypher_sink_res_${graft.sources.Staging.dirKey(dir)}" +
        s"_${Queries51.sinkNonce.incrementAndGet()}"
      val srv = new BoltLoopbackServer(token, failTransientOnce = true)
      try {
        graft.sinks.CypherSink.writeGraph(verts, edges,
          BoltSocketSessionFactory(srv.host, srv.port,
            maxRetries = 3, retryBackoffMs = 5L), batchSize = 1000)
        Queries51.storeCounts(s, InMemoryBolt.store(token))
      } finally { srv.close(); InMemoryBolt.drop(token) }
    },
    // identical truth again: faults + retry must not change the store
    Queries51.g_cypher_sink.oracle)

  /** Streaming ingest → Cypher MERGE sink: the orders feed drives
    * per-micro-batch `UNWIND … MERGE` graph writes (facts from the
    * batch, dims re-MERGEd each tick like the reference's idempotent
    * projectors). The oracle is the batch replay — the stream must
    * converge to it regardless of batch boundaries, which is the
    * idempotence-as-exactly-once property the MERGE family provides.
    */
  val stream_cypher_sink = Q(
    (s, dir) => {
      import graft.sinks.InMemoryBolt
      val token = s"stream_cypher_${graft.sources.Staging.dirKey(dir)}" +
        s"_${Queries51.sinkNonce.incrementAndGet()}"
      try {
        graft.streaming.StreamingCypherSink.ordersGraphOnce(
          s, s"$dir/orders.parquet",
          graft.sources.Tables.read(s, dir, "customer"),
          graft.sources.Tables.read(s, dir, "nation"),
          graft.sources.Tables.read(s, dir, "region"),
          InMemoryBolt.Factory(token))
        Queries51.storeCounts(s, InMemoryBolt.store(token))
      } finally InMemoryBolt.drop(token)
    },
    // the same truth as the batch sink entries, minus nothing: every
    // order lands exactly once, dims exactly once, 4 constraints
    Queries51.g_cypher_sink.oracle,
    // cost model is stream-drain + per-batch sink writes, not a plain
    // batch plan — excluded from the bench set like the other
    // streaming runners
    bench = false)

  val all: Map[String, Q] = Map(
    "g_cypher_sink_tcp" -> g_cypher_sink_tcp,
    "g_cypher_sink_resilient" -> g_cypher_sink_resilient,
    "stream_cypher_sink" -> stream_cypher_sink,
  )
}
