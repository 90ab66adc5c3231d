package graft.serving

import graft.analyzer.RequestModel.Model
import graft.planner.Planner.Planned
import graft.semantic.Domain.jStr

/** Request-log sink — the analogue of the reference's request-log
  * module (request-log/.../KafkaMahaRequestLogWriter.scala:18-26
  * MahaRequestLogWriter / NoopMahaRequestLogWriter; envelope fields per
  * request-log/src/proto/MahaRequestLog.proto).
  *
  * The envelope mirrors the proto's single-engine-relevant fields
  * (requestId, cube/revision, schema, requestType, chosen fact,
  * start/end times, status, error, filter/sort shape). The TRANSPORT
  * is pluggable behind [[RequestLogWriter]]: this container has no
  * Kafka broker, so the shipped backends are JSON-lines file (one
  * record per line — the shape a Kafka producer would send as the
  * message value, keyed by requestId), in-memory (tests/inspection),
  * and no-op. A Kafka backend is a config drop-in: same envelope,
  * `producer.send(topic, requestId, json)`.
  */
object RequestLog {

  final case class RequestLogRecord(
      requestId: String,
      cube: String,
      revision: Int,
      schema: Option[String],
      requestType: String,           // sync | async
      drivingTable: String,          // chosen fact variant
      isDimDriven: Boolean,
      hasFactFilters: Boolean,
      hasDimFilters: Boolean,
      hasMetricFilters: Boolean,
      /** Effective window width in days; None = unbounded request. */
      numDays: Option[Int],
      requestStartTime: Long,
      requestEndTime: Long,
      status: Int,                   // 200 | 400
      errorMessage: Option[String]) {

    def toJson: String = {
      def opt(o: Option[String]) = o.fold("null")(jStr)
      s"""{"requestId":${jStr(requestId)},"cube":${jStr(cube)},""" +
        s""""revision":$revision,"schema":${opt(schema)},""" +
        s""""requestType":${jStr(requestType)},""" +
        s""""drivingTable":${jStr(drivingTable)},""" +
        s""""isDimDriven":$isDimDriven,"hasFactFilters":$hasFactFilters,""" +
        s""""hasDimFilters":$hasDimFilters,"hasMetricFilters":$hasMetricFilters,""" +
        s""""numDays":${numDays.fold("null")(_.toString)},""" +
        s""""requestStartTime":$requestStartTime,"requestEndTime":$requestEndTime,""" +
        s""""status":$status,"errorMessage":${opt(errorMessage)}}"""
    }
  }

  trait RequestLogWriter {
    def write(rec: RequestLogRecord): Unit
    def close(): Unit = ()
  }

  /** NoopMahaRequestLogWriter analogue. */
  object NoopWriter extends RequestLogWriter {
    def write(rec: RequestLogRecord): Unit = ()
  }

  /** Test/inspection backend. */
  final class InMemoryWriter extends RequestLogWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[RequestLogRecord]
    def write(rec: RequestLogRecord): Unit = synchronized { buf += rec }
    def records: Seq[RequestLogRecord] = synchronized { buf.toSeq }
  }

  /** Minimal producer interface — the send(topic, key, value) shape of
    * org.apache.kafka.clients.producer.KafkaProducer (reference
    * request-log/.../KafkaMahaRequestLogWriter.scala:18-26 publishes
    * the proto envelope this way). A real Kafka backend is
    * [[ProducerWriter]] handed a KafkaProducer adapter; tests exercise
    * the identical path with [[MockProducer]] (no broker ships in this
    * container). */
  trait Producer {
    def send(topic: String, key: String, value: Array[Byte]): Unit
    def close(): Unit = ()
  }

  /** In-memory capture of produced records, in send order. */
  final class MockProducer extends Producer {
    private val buf =
      scala.collection.mutable.ArrayBuffer.empty[(String, String, Array[Byte])]
    def send(topic: String, key: String, value: Array[Byte]): Unit =
      synchronized { buf += ((topic, key, value)) }
    def sent: Seq[(String, String, Array[Byte])] = synchronized(buf.toSeq)
  }

  /** Kafka-transport backend: each envelope published to `topic`,
    * keyed by requestId (key-partitioning keeps one request's records
    * in order on one partition), value = the JSON envelope's UTF-8
    * bytes — the message a downstream request-log consumer reads. */
  final class ProducerWriter(producer: Producer, topic: String)
      extends RequestLogWriter {
    def write(rec: RequestLogRecord): Unit =
      producer.send(topic, rec.requestId,
        rec.toJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    override def close(): Unit = producer.close()
  }

  /** JSON-lines file backend: one envelope per line, append-only —
    * exactly what a Kafka producer would publish as message values. */
  final class JsonLinesWriter(path: java.nio.file.Path) extends RequestLogWriter {
    private val out = java.nio.file.Files.newBufferedWriter(path,
      java.nio.charset.StandardCharsets.UTF_8,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    def write(rec: RequestLogRecord): Unit = synchronized {
      out.write(rec.toJson); out.newLine(); out.flush()
    }
    override def close(): Unit = synchronized(out.close())
  }

  /** Build the envelope from an analyzed + planned request.
    * hasFactFilters/hasDimFilters split the request's pushable filter
    * leaves by OWNERSHIP (fact-level column vs snowflake dim
    * attribute), matching the proto's hasFactFilters/hasDimFilters —
    * dims joined merely for selected attributes set neither. */
  def record(requestId: String, m: Model, planned: Planned,
      startMs: Long, endMs: Long): RequestLogRecord = {
    val dimAttrs = m.cube.dims.flatMap(_.cols.map(_.alias)).toSet
    val filterFields = m.dimFilters.flatMap(graft.analyzer.request.leaves).map(_.field)
    RequestLogRecord(
      requestId = requestId,
      cube = m.cube.name,
      revision = m.cube.revision,
      schema = m.req.schema,
      requestType = if (m.req.async) "async" else "sync",
      drivingTable = planned.factName,
      isDimDriven = m.isDimDriven,
      hasFactFilters = filterFields.exists(!dimAttrs(_)),
      hasDimFilters = filterFields.exists(dimAttrs),
      hasMetricFilters = m.metricFilters.nonEmpty,
      numDays = m.numDays,
      requestStartTime = startMs,
      requestEndTime = endMs,
      status = 200,
      errorMessage = None)
  }

  /** Serving-completion envelope: what the HTTP layer stamps AFTER the
    * result page is materialized (the plan-time envelope from
    * runLogged carries the model detail; this one carries the true
    * end-to-end latency). */
  def served(requestId: String, cube: String,
      startMs: Long, endMs: Long): RequestLogRecord =
    RequestLogRecord(requestId, cube, revision = -1, schema = None,
      requestType = "sync", drivingTable = "", isDimDriven = false,
      hasFactFilters = false, hasDimFilters = false, hasMetricFilters = false,
      numDays = None, requestStartTime = startMs, requestEndTime = endMs,
      status = 200, errorMessage = None)

  /** Failure envelope (status 400, no chosen fact). */
  def failure(requestId: String, cube: String, error: String,
      startMs: Long, endMs: Long): RequestLogRecord =
    RequestLogRecord(requestId, cube, revision = -1, schema = None,
      requestType = "sync", drivingTable = "", isDimDriven = false,
      hasFactFilters = false, hasDimFilters = false, hasMetricFilters = false,
      numDays = None, requestStartTime = startMs, requestEndTime = endMs,
      status = 400, errorMessage = Some(error))
}
