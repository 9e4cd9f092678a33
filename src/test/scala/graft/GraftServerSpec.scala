package graft

import graft.server.{GraftServer, Wire}

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** End-to-end spec for the HTTP wire protocol: starts the real server
  * (ephemeral port) and drives it with the exact JSON the reference's
  * Python client emits (client.py:200-245) — the example_small flow
  * (client.py:249-256), plus join/order/group/take/count and the
  * protocol error surface.
  */
class GraftServerSpec extends SparkSpec {

  private lazy val server = {
    val s = GraftServer.start(spark, 0)
    sys.addShutdownHook(s.stop(0))
    s
  }
  private lazy val uri =
    URI.create(s"http://127.0.0.1:${server.getAddress.getPort}/call")
  private val http = HttpClient.newHttpClient()

  private def post(body: String): (Int, String) = {
    val req = HttpRequest.newBuilder(uri)
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    val res = http.send(req, HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  /** POST, assert 201, return the response `dataframe` state JSON. */
  private def callOk(df: String, function: String): (String, String) = {
    val (status, body) = post(s"""{"dataframe": $df, "function": $function}""")
    assert(status === 201, s"expected 201, got $status: $body")
    val node = Wire.parse(body)
    (Wire.render(node.get("dataframe")), Wire.render(node.get("blocks")))
  }

  // headerless |-separated CSV like the reference's data/small.csv
  private lazy val csvPath = {
    val p = Files.createTempFile("graft_small", ".csv")
    Files.write(p, "1|foo|true\n2|bar|false\n3|baz|true\n"
      .getBytes(StandardCharsets.UTF_8))
    p.toAbsolutePath.toString
  }
  private val schemaJson =
    """{"columns": [{"name": "int", "type_": "Int"},
      |             {"name": "string", "type_": "String"},
      |             {"name": "bool", "type_": "Bool"}]}""".stripMargin

  private def readState: String =
    callOk("null", s"""{"Read": ["csv", "$csvPath", $schemaJson]}""")._1

  // client.py example_small: read → filter(bool == true) →
  // select([c('int')]) → aggregate({int: Average}) → collect
  test("wire: example_small flow (filter/select/aggregate/collect)") {
    val s1 = readState
    val s2 = callOk(s1,
      """{"Op": {"Filter": ["bool",
        |  {"comparator": "Equal", "value": {"Bool": true}}]}}""".stripMargin)._1
    val s3 = callOk(s2, """{"Op": {"Select": [{"Source": "int"}]}}""")._1
    val s4 = callOk(s3, """{"Op": {"Aggregation": {"int": "Average"}}}""")._1
    val (_, blocks) = callOk(s4, """{"Action": "Collect"}""")
    assert(Wire.parse(blocks).get("int").get("Float").get(0).asDouble() === 2.0)
  }

  test("wire: select arithmetic with alias, float constant encoding") {
    val s1 = readState
    // (int * 10).alias('tens') + the client's phantom float form
    val s2 = callOk(s1,
      """{"Op": {"Select": [
        |  {"Alias": ["tens", {"Operation": ["Multiply",
        |    {"Source": "int"}, {"Constant": {"Int": 10}}]}]},
        |  {"Alias": ["halves", {"Operation": ["Divide",
        |    {"Source": "int"},
        |    {"Constant": {"Float": {"value": 2.0, "phantom": null}}}]}]}
        |]}}""".stripMargin)._1
    val (_, blocks) = callOk(s2, """{"Action": "Collect"}""")
    val b = Wire.parse(blocks)
    assert(b.get("tens").get("Int").get(2).asLong() === 30L)
    assert(b.get("halves").get("Float").get(1).asDouble() === 1.0)
  }

  test("wire: group_by nests lists; order_by sorts") {
    val s1 = readState
    val s2 = callOk(s1, """{"Op": {"Select": [{"Source": "bool"}, {"Source": "int"}]}}""")._1
    val s3 = callOk(s2, """{"Op": {"GroupBy": ["bool"]}}""")._1
    val (_, blocks) = callOk(s3, """{"Action": "Collect"}""")
    val b = Wire.parse(blocks)
    assert(b.get("int").get("IntList").get(1).get(0).asLong() === 1L)
    val s4 = callOk(s2, """{"Op": {"OrderBy": ["int"]}}""")._1
    val (_, blocks2) = callOk(s4, """{"Action": "Count"}""")
    assert(Wire.parse(blocks2).get("count").get("Int").get(0).asLong() === 3L)
  }

  test("wire: join round-trips a right-side lineage; take limits") {
    val s1 = readState
    val right = callOk(s1,
      """{"Op": {"Select": [
        |  {"Alias": ["k", {"Operation": ["Add",
        |    {"Source": "int"}, {"Constant": {"Int": 0}}]}]},
        |  {"Alias": ["negated", {"Operation": ["Subtract",
        |    {"Constant": {"Int": 0}}, {"Source": "int"}]}]}]}}""".stripMargin)._1
    val joined = callOk(s1, s"""{"Op": {"Join": [$right, "int", "k"]}}""")._1
    val (_, blocks) = callOk(joined, """{"Action": {"Take": 2}}""")
    val b = Wire.parse(blocks)
    assert(b.get("negated").get("Int").get(0).asLong() === -1L)
    assert(b.get("int").get("Int").size() === 2)
  }

  test("wire: beyond-reference verbs — DedupExact, MinhashPairs, WindowTopK") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra"
    val p = Files.createTempFile("graft_dup", ".csv")
    Files.write(p,
      (s"1|$base tango\n" +          // rep of the near-dup pair
        s"2|$base tango\n" +         // exact dup of 1
        s"3|$base uniform\n" +       // near dup of 1 (jaccard ~0.89)
        "4|totally different words sharing nothing with the corpus\n")
        .getBytes(StandardCharsets.UTF_8))
    val dupSchema =
      """{"columns": [{"name": "id", "type_": "Int"},
        |             {"name": "text", "type_": "String"}]}""".stripMargin
    val s1 = callOk("null",
      s"""{"Read": ["csv", "${p.toAbsolutePath}", $dupSchema]}""")._1
    // dedup_exact keeps the lowest id per distinct content
    val reps = callOk(s1, """{"Op": {"DedupExact": ["id", "text"]}}""")._1
    val (_, cnt) = callOk(reps, """{"Action": "Count"}""")
    assert(Wire.parse(cnt).get("count").get("Int").get(0).asLong() === 3L)
    // composition on the wire: dedup → near-dup pairs
    val pairs = callOk(reps, """{"Op": {"MinhashPairs": ["id", "text", 0.5]}}""")._1
    val (_, pb) = callOk(pairs, """{"Action": "Collect"}""")
    val pn = Wire.parse(pb)
    assert(pn.get("id_a").get("Int").get(0).asLong() === 1L)
    assert(pn.get("id_b").get("Int").get(0).asLong() === 3L)
    assert(pn.get("jaccard").get("Float").get(0).asDouble() > 0.85)
    // window top-k: highest id per distinct text, rank appended
    val topk = callOk(s1, """{"Op": {"WindowTopK": ["text", "id", 1]}}""")._1
    val (_, tb) = callOk(topk, """{"Action": "Count"}""")
    assert(Wire.parse(tb).get("count").get("Int").get(0).asLong() === 3L)
    // validation: missing column is a plan-time 400
    assert(post(s"""{"dataframe": $s1, "function":
      {"Op": {"DedupExact": ["nope", "text"]}}}""")._1 === 400)
  }

  test("wire: SnapshotDiff verb diffs two read lineages") {
    val mk = (rows: String, tag: String) => {
      val p = Files.createTempFile(s"graft_snap_$tag", ".csv")
      Files.write(p, rows.getBytes(StandardCharsets.UTF_8))
      p.toAbsolutePath
    }
    val schema =
      """{"columns": [{"name": "id", "type_": "Int"},
        |             {"name": "text", "type_": "String"}]}""".stripMargin
    val oldP = mk("1|aaa\n2|bbb\n3|ccc\n", "old")
    val newP = mk("2|bbb\n3|ccc revised\n4|ddd\n", "new")
    val oldS = callOk("null", s"""{"Read": ["csv", "$oldP", $schema]}""")._1
    val newS = callOk("null", s"""{"Read": ["csv", "$newP", $schema]}""")._1
    // the new snapshot rides inside the verb as a full lineage state,
    // exactly like Join's right side
    val diff = callOk(oldS,
      s"""{"Op": {"SnapshotDiff": [$newS, "id", "text"]}}""")._1
    val (_, db) = callOk(diff, """{"Action": "Collect"}""")
    val d = Wire.parse(db)
    val changes = (0 until 3).map(i =>
      d.get("key").get("Int").get(i).asLong() ->
        d.get("change").get("String").get(i).asText()).toMap
    assert(changes === Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
    // missing key column in either side is a plan-time 400
    assert(post(s"""{"dataframe": $oldS, "function":
      {"Op": {"SnapshotDiff": [$newS, "nope", "text"]}}}""")._1 === 400)
  }

  test("wire: SemanticDecontam verb matches the operator exactly") {
    val emb = "/root/testdata/sf0.001/embeddings.parquet"
    val empty = """{"columns": []}"""
    val all = callOk("null", s"""{"Read": ["parquet", "$emb", $empty]}""")._1
    val evalS = callOk(all,
      """{"Op": {"Filter": ["vec_id",
        |  {"comparator": "LessThan", "value": {"Int": 5}}]}}""".stripMargin)._1
    val trainS = callOk(all,
      """{"Op": {"Filter": ["vec_id",
        |  {"comparator": "GreaterThanOrEq", "value": {"Int": 5}}]}}""".stripMargin)._1
    val flagged = callOk(trainS,
      s"""{"Op": {"SemanticDecontam": [$evalS, "vec_id", "embedding", 0.3]}}""")._1
    val sorted = callOk(flagged, """{"Op": {"OrderBy": ["train_id"]}}""")._1
    val (_, blocks) = callOk(sorted, """{"Action": "Collect"}""")
    val got = Wire.parse(blocks)
    // ground truth straight from the operator on the same parquet
    val df = spark.read.parquet(emb)
    val want = graft.operators.Similarity.semanticDecontaminate(
        df.filter(org.apache.spark.sql.functions.col("vec_id") >= 5),
        df.filter(org.apache.spark.sql.functions.col("vec_id") < 5),
        "vec_id", "vec_id", "embedding", "embedding", tau = 0.3)
      .orderBy("train_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val n = got.get("train_id").get("Int").size()
    assert(n === want.length && n > 0)
    (0 until n).foreach { i =>
      assert(got.get("train_id").get("Int").get(i).asLong() === want(i)._1)
      assert(got.get("eval_id").get("Int").get(i).asLong() === want(i)._2)
      assert(math.abs(got.get("cosine").get("Float").get(i).asDouble()
        - want(i)._3) < 1e-12)
    }
    // vectors never ship: missing column is a plan-time 400
    assert(post(s"""{"dataframe": $trainS, "function":
      {"Op": {"SemanticDecontam": [$evalS, "nope", "embedding", 0.3]}}}""")._1 === 400)
  }

  test("wire: protocol and plan errors are 400 with a message") {
    // malformed JSON
    assert(post("{nope")._1 === 400)
    // unaliased computed expr → the facade's AliasRequired, as 400
    val s1 = readState
    val (st, body) = post(s"""{"dataframe": $s1, "function":
      {"Op": {"Select": [{"Operation": ["Add",
        {"Source": "int"}, {"Source": "int"}]}]}}}""")
    assert(st === 400)
    assert(body.contains("AliasRequired"))
    // missing dataframe for an Op
    assert(post("""{"dataframe": null, "function":
      {"Op": {"OrderBy": ["int"]}}}""")._1 === 400)
    // unknown column at plan-build time
    assert(post(s"""{"dataframe": $s1, "function":
      {"Op": {"Filter": ["nope",
        {"comparator": "Equal", "value": {"Int": 1}}]}}}""")._1 === 400)
    // non-POST and wrong path
    val get = HttpRequest.newBuilder(uri).GET().build()
    assert(http.send(get, HttpResponse.BodyHandlers.ofString()).statusCode() === 404)
  }

  test("wire: CollectPage slices; a row-capped server rejects big Collects") {
    // paging on the default (uncapped) server: ordered pages stitch
    val s1 = readState
    val so = callOk(s1, """{"Op": {"OrderBy": ["int"]}}""")._1
    val (_, p1) = callOk(so,
      """{"Action": {"CollectPage": {"offset": 0, "limit": 2}}}""")
    val (_, p2) = callOk(so,
      """{"Action": {"CollectPage": {"offset": 2, "limit": 2}}}""")
    assert(Wire.parse(p1).get("int").get("Int").get(0).asInt() === 1)
    assert(Wire.parse(p1).get("int").get("Int").get(1).asInt() === 2)
    assert(Wire.parse(p2).get("int").get("Int").get(0).asInt() === 3)
    assert(Wire.parse(p2).get("int").get("Int").size() === 1)
    // malformed page spec is a 400
    assert(post(s"""{"dataframe": $so, "function":
      {"Action": {"CollectPage": {"offset": -1, "limit": 2}}}}""")._1 === 400)
    // offset/limit beyond Int.MaxValue are a 400 validation error, not
    // an Int-wrap 500 / silently wrong page (they feed Dataset
    // offset()/limit(), which take Int)
    val (bigOffSt, bigOffBody) = post(s"""{"dataframe": $so, "function":
      {"Action": {"CollectPage": {"offset": 2147483648, "limit": 2}}}}""")
    assert(bigOffSt === 400, bigOffBody)
    assert(bigOffBody.contains("Int.MaxValue"))
    assert(post(s"""{"dataframe": $so, "function":
      {"Action": {"CollectPage": {"offset": 0, "limit": 9999999999}}}}""")._1 === 400)

    // a CAPPED server (cap = 2): big Collect → 400 naming the cap and
    // pointing at CollectPage; within-cap Collect and paging still work
    val capped = GraftServer.start(spark, 0, Some(2L))
    try {
      val curi = URI.create(
        s"http://127.0.0.1:${capped.getAddress.getPort}/call")
      def cpost(body: String): (Int, String) = {
        val req = HttpRequest.newBuilder(curi)
          .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
          .build()
        val res = http.send(req, HttpResponse.BodyHandlers.ofString())
        (res.statusCode(), res.body())
      }
      val (rs, rb) = cpost(s"""{"dataframe": null, "function":
        {"Read": ["csv", "$csvPath", $schemaJson]}}""")
      assert(rs === 201, rb)
      val state = Wire.render(Wire.parse(rb).get("dataframe"))
      val (bigSt, bigBody) = cpost(
        s"""{"dataframe": $state, "function": {"Action": "Collect"}}""")
      assert(bigSt === 400, s"3-row Collect must exceed cap 2: $bigBody")
      assert(bigBody.contains("row cap (2)") && bigBody.contains("CollectPage"))
      // page limit above the cap is also rejected
      assert(cpost(s"""{"dataframe": $state, "function":
        {"Action": {"CollectPage": {"offset": 0, "limit": 5}}}}""")._1 === 400)
      // a within-cap page succeeds
      val (ps, pb) = cpost(s"""{"dataframe": $state, "function":
        {"Action": {"CollectPage": {"offset": 0, "limit": 2}}}}""")
      assert(ps === 201, pb)
      assert(Wire.parse(pb).get("blocks").get("int").get("Int").size() === 2)
      // Take under the cap still collects (reference semantics kept)
      val (ts, tb) = cpost(s"""{"dataframe": $state, "function":
        {"Action": {"Take": 2}}}""")
      assert(ts === 201, tb)
    } finally capped.stop(0)
  }
}
