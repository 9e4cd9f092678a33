package graft.server

import com.fasterxml.jackson.databind.JsonNode
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession
import graft.api.GraftException

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

/** The reference engine's remote usage mode: an HTTP JSON API serving
  * `POST /call` (reference: src/api.rs:149-168; the Python client DSL
  * in client.py:194-245 is the canonical consumer). Same endpoint,
  * same request/response JSON, same status codes (201 Created on
  * success, 400 on protocol/plan errors, 404 elsewhere) — a reference
  * client.py pointed at this server runs unchanged.
  *
  * Differences, all documented in [[Wire]]:
  *  - the `dataframe` state token is our lineage encoding (clients
  *    round-trip it opaquely, so this is invisible to them);
  *  - `Count` and `Take` are implemented (the reference server panics
  *    on them — src/api.rs:77 `unimplemented!()`);
  *  - Float NaN crosses the wire as JSON null.
  *
  * Built on the JDK's HttpServer (zero added dependencies). One shared
  * SparkSession; requests build lazy plans and only Actions execute.
  */
object GraftServer {

  /** Handle one parsed request body → (status, response JSON/text). */
  def handle(spark: SparkSession, body: JsonNode): (Int, String) =
    handle(spark, body, None)

  /** As [[handle]], with an optional server-side cap on rows a single
    * Collect may return. Default None = exact reference semantics
    * (`Collect` materializes everything, api.rs:62-75). With a cap, a
    * too-large Collect is rejected 400 — BEFORE the driver holds more
    * than cap+1 rows (the probe is `limit(cap+1).collect()`, so driver
    * memory is bounded by the cap even for a pathological remote
    * query) — and the client is pointed at the beyond-reference
    * `CollectPage {offset, limit}` action, which streams any result in
    * bounded slices (compose with order_by for stable page frames).
    */
  def handle(spark: SparkSession, body: JsonNode,
             maxCollectRows: Option[Long]): (Int, String) =
    try {
      val state = body.get("dataframe")
      val fn = body.get("function")
      if (fn == null || !fn.isObject || fn.size() != 1)
        throw new GraftException(s"malformed function: $fn")
      val tag = fn.fieldNames().next()
      tag match {
        case "Read" | "Op" =>
          // plan-building: validate eagerly (the facade throws on bad
          // schema/alias/keys like the reference), execute nothing
          val entry = if (tag == "Read") fn else fn.get("Op")
          val priorOps =
            if (state == null || state.isNull) Wire.arr()
            else {
              Wire.replay(spark, state) // re-validate the prior lineage
              state.get("ops").deepCopy[com.fasterxml.jackson.databind.node.ArrayNode]()
            }
          val frame =
            if (tag == "Read") Wire.applyOp(spark, null, entry)
            else Wire.applyOp(spark, Wire.replay(spark, state), entry)
          frame.df.schema // force analysis so plan errors surface now
          val newState = Wire.obj()
          newState.set[JsonNode]("ops", priorOps.add(entry.deepCopy[JsonNode]()))
          val resp = Wire.obj()
          resp.set[JsonNode]("dataframe", newState)
          resp.set[JsonNode]("blocks", Wire.obj())
          (201, Wire.render(resp))
        case "Action" =>
          val frame = Wire.replay(spark, state)
          val action = fn.get("Action")
          val blocks =
            if (action.isTextual && action.asText() == "Collect") {
              maxCollectRows match {
                case Some(cap) =>
                  // clamp the probe (cap is server config, not client
                  // input): a cap ≥ Int.MaxValue must not wrap negative
                  // in limit() — probe at Int.MaxValue and the cap
                  // check below still holds
                  val probeN = math.min(cap + 1, Int.MaxValue.toLong).toInt
                  val probe = frame.df.limit(probeN).collect()
                  if (probe.length > cap)
                    throw new GraftException(
                      s"Collect result exceeds the server row cap ($cap); " +
                        "page it with Action {\"CollectPage\": {\"offset\": N, " +
                        "\"limit\": M}} (order_by first for stable pages)")
                  Wire.blocksOf(probe, frame.df.schema)
                case None => Wire.blocksOf(frame.df.collect(), frame.df.schema)
              }
            } else if (action.isObject && action.has("CollectPage")) {
              val p = action.get("CollectPage")
              if (p == null || !p.has("offset") || !p.has("limit"))
                throw new GraftException(s"CollectPage needs {offset, limit}: $action")
              val off = p.get("offset").asLong()
              val lim = p.get("limit").asLong()
              if (off < 0 || lim <= 0)
                throw new GraftException(s"CollectPage offset/limit out of range: $action")
              // offset/limit feed Int-typed Dataset operators: values
              // above Int.MaxValue would wrap on .toInt into a negative
              // (500) or a silently wrong page — reject as a 400
              // validation error like the sign checks above
              if (off > Int.MaxValue.toLong || lim > Int.MaxValue.toLong)
                throw new GraftException(
                  s"CollectPage offset/limit exceed Int.MaxValue: $action")
              maxCollectRows.foreach { cap =>
                if (lim > cap) throw new GraftException(
                  s"CollectPage limit $lim exceeds the server row cap ($cap)")
              }
              Wire.blocksOf(
                frame.df.offset(off.toInt).limit(lim.toInt).collect(),
                frame.df.schema)
            } else if (action.isTextual && action.asText() == "Count") {
              val b = Wire.obj(); val a = Wire.arr().add(frame.count())
              val tagged = Wire.obj(); tagged.set[JsonNode]("Int", a)
              b.set[JsonNode]("count", tagged); b
            } else if (action.isObject && action.has("Take")) {
              val limited = frame.take(action.get("Take").asInt())
              Wire.blocksOf(limited.df.collect(), limited.df.schema)
            } else throw new GraftException(s"unknown action: $action")
          val resp = Wire.obj()
          resp.set[JsonNode]("dataframe", state.deepCopy[JsonNode]())
          resp.set[JsonNode]("blocks", blocks)
          (201, Wire.render(resp))
        case other =>
          throw new GraftException(s"unknown function tag: $other")
      }
    } catch {
      // 400 like the reference (src/api.rs:25-28: every error is
      // BadRequest with a debug-printed message body)
      case e: GraftException => (400, s"DataFrame(${e.getMessage})")
      case e: org.apache.spark.sql.AnalysisException => (400, s"DataFrame(${e.getMessage})")
      case e: Throwable =>
        e.printStackTrace()
        (500, s"Internal(${e.getClass.getSimpleName}: ${e.getMessage})")
    }

  /** Start the server; returns it (caller stops). Port 0 = ephemeral.
    * `maxCollectRows` None = reference Collect semantics (default). */
  def start(spark: SparkSession, port: Int,
            maxCollectRows: Option[Long] = None): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/call", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val (status, payload) =
          if (x.getRequestMethod != "POST") (404, "not found")
          else try {
            val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            GraftServer.handle(spark, Wire.parse(body), maxCollectRows)
          } catch {
            case _: com.fasterxml.jackson.core.JacksonException => (400, "MalformedJSON")
            case e: Throwable => (500, s"Internal(${e.getClass.getSimpleName}: ${e.getMessage})")
          }
        val bytes = payload.getBytes(StandardCharsets.UTF_8)
        x.getResponseHeaders.set("Content-Type",
          if (status == 201) "application/json" else "text/plain")
        x.sendResponseHeaders(status, bytes.length.toLong)
        val os = x.getResponseBody
        try os.write(bytes) finally os.close()
      }
    })
    server.setExecutor(Executors.newFixedThreadPool(8))
    server.start()
    server
  }

  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(3000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-server")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cap = sys.env.get("GRAFT_MAX_COLLECT_ROWS").map(_.toLong)
    start(spark, port, cap)
    println(s"[graft-server] listening on http://127.0.0.1:$port/call" +
      cap.map(c => s" (collect row cap $c)").getOrElse(""))
    Thread.currentThread().join()
  }
}
