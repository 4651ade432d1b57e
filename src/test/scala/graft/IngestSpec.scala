package graft

import java.nio.file.Files
import java.time.{LocalDate, ZonedDateTime, ZoneId}

import org.apache.spark.sql.functions._

import graft.ingest._
import graft.pipeline.{MergeWriter, Pipeline}

/** Ingestion machinery: calendar, retry policy, ledger idempotency,
  * end-to-end ingest, pipeline DAG + partition MERGE.
  */
class IngestSpec extends SparkSpec {

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("NYSE calendar: 2024 holidays, weekends, observation shifts") {
    import TradingCalendar._
    // Known 2024 NYSE closures
    Seq("2024-01-01", "2024-01-15", "2024-02-19", "2024-03-29", "2024-05-27",
      "2024-06-19", "2024-07-04", "2024-09-02", "2024-11-28", "2024-12-25")
      .foreach(d => assert(!isTradingDay(LocalDate.parse(d)), s"$d should be closed"))
    assert(!isTradingDay(LocalDate.parse("2024-08-10"))) // Saturday
    assert(isTradingDay(LocalDate.parse("2024-08-12"))) // ordinary Monday
    // July 4 2026 falls on Saturday -> observed Friday July 3
    assert(!isTradingDay(LocalDate.parse("2026-07-03")))
    // New Year's 2022 fell on Saturday -> NYSE did NOT observe Dec 31 2021
    assert(isTradingDay(LocalDate.parse("2021-12-31")))
    // Easter computus spot checks
    assert(easterSunday(2024) == LocalDate.parse("2024-03-31"))
    assert(easterSunday(2026) == LocalDate.parse("2026-04-05"))
  }

  test("lastCompletedTradingDay skips weekends/holidays in market time") {
    val mondayNoonUtc = ZonedDateTime.of(2024, 7, 8, 12, 0, 0, 0, ZoneId.of("UTC"))
    assert(TradingCalendar.lastCompletedTradingDay(mondayNoonUtc) == LocalDate.parse("2024-07-05"))
    val fridayAfterJuly4 = ZonedDateTime.of(2024, 7, 5, 12, 0, 0, 0, ZoneId.of("UTC"))
    assert(TradingCalendar.lastCompletedTradingDay(fridayAfterJuly4) == LocalDate.parse("2024-07-03"))
  }

  test("retry policy: 429 sleeps 60s, 5xx sleeps 5s, 4xx aborts, 3rd failure throws") {
    import FetchResult._
    val d = LocalDate.parse("2024-07-01")
    var sleeps = Vector.empty[Long]
    def client(results: FetchResult*) = {
      val it = results.iterator
      new RetryingClient(_ => it.next(), sleeper = ms => sleeps :+= ms)
    }
    assert(client(RateLimited(), ServerError(503), Ok(Seq.empty)).groupedDaily(d).isEmpty)
    assert(sleeps == Vector(60000L, 5000L))

    sleeps = Vector.empty
    intercept[RuntimeException](client(TimedOut(10000), TimedOut(10000), TimedOut(10000)).groupedDaily(d))
    assert(sleeps == Vector(5000L, 5000L))

    sleeps = Vector.empty
    intercept[RuntimeException](client(ClientError(404)).groupedDaily(d))
    assert(sleeps.isEmpty) // no retry on non-retryable 4xx
  }

  test("ingest end-to-end: fixture fetch, ledger bracketing, idempotent replay") {
    val rawPath = tmp("raw")
    val ledger = new CheckpointLedger(spark, tmp("ledger") + "/ledger")
    val job = new IngestJob(spark, new FixtureClient(20), ledger, rawPath)
    val now = ZonedDateTime.of(2024, 7, 9, 18, 0, 0, 0, ZoneId.of("America/New_York"))

    val out1 = job.run(now, daysBack = 4) // calendar days: Sat+Sun skipped
    assert(out1.map(_.date.toString) == Seq("2024-07-05", "2024-07-08")) // July 4 + weekend skipped
    assert(out1.forall(o => o.status == "completed" && o.rows == 20))

    val raw = spark.read.parquet(rawPath)
    assert(raw.count() == 40)
    assert(raw.schema.fieldNames.toSet == RawLoader.rawSchema.fieldNames.toSet)
    // DATE-partitioned layout prunes on the date predicate
    assert(raw.filter(col("DATE") === "2024-07-08").count() == 20)

    // replay: ledger's completed set short-circuits everything
    val out2 = job.run(now, daysBack = 4)
    assert(out2.isEmpty)
    assert(spark.read.parquet(rawPath).count() == 40)
    assert(ledger.completedDates() ==
      Set(LocalDate.parse("2024-07-05"), LocalDate.parse("2024-07-08")))
  }

  test("ingested raw data flows through staging with correct flags") {
    val rawPath = tmp("rawbridge")
    val ledger = new CheckpointLedger(spark, tmp("ledgerb") + "/ledger")
    val job = new IngestJob(spark, new FixtureClient(10), ledger, rawPath)
    val now = ZonedDateTime.of(2024, 7, 9, 18, 0, 0, 0, ZoneId.of("America/New_York"))
    job.run(now, daysBack = 1)
    val stg = graft.models.StgDailyStocks.build(spark.read.parquet(rawPath))
    assert(stg.count() == 10)
    assert(stg.filter(col("trade_date").isNull).count() == 0)
    // fixture bars have positive volume and consistent OHLC
    assert(stg.filter(col("has_volume") =!= 1 || col("is_valid_record") =!= 1).count() == 0)
    assert(stg.columns.contains("volume_weighted_avg"))
  }

  test("JSON envelope decode: schema'd from_json seam, end-to-end through ingest") {
    val rawPath = tmp("rawenv")
    val ledger = new CheckpointLedger(spark, tmp("ledgerenv") + "/ledger")
    // canned vendor envelope: one full bar, one bar missing the optional
    // vw/n keys, one malformed bar with no grain key (no T/t)
    def envelope(date: LocalDate): String = {
      val t = date.toEpochDay * 86400000L
      s"""{"status":"OK","queryCount":3,"resultsCount":3,"adjusted":true,""" +
        s""""request_id":"r1","results":[""" +
        s"""{"T":"ENV1","v":1000.0,"vw":10.5,"o":10.0,"c":11.0,"h":11.5,"l":9.5,"n":42,"t":$t},""" +
        s"""{"T":"ENV2","v":2000.0,"o":20.0,"c":21.0,"h":21.5,"l":19.5,"t":$t},""" +
        s"""{"v":1.0,"o":1.0,"c":1.0,"h":1.0,"l":1.0}]}"""
    }
    val client = new JsonEnvelopeClient(spark, envelope)
    val d = LocalDate.parse("2024-07-08")
    val bars = client.groupedDaily(d)
    assert(bars.map(_.ticker) == Seq("ENV1", "ENV2")) // malformed bar dropped
    assert(bars(0).vwap.contains(10.5) && bars(0).numTransactions.contains(42L))
    assert(bars(1).vwap.isEmpty && bars(1).numTransactions.isEmpty)
    assert(bars(1).epochMillis == d.toEpochDay * 86400000L)

    // resultless / empty-results envelopes decode to zero bars (the
    // reference returns None for both — extraction.py:33-41)
    assert(new JsonEnvelopeClient(spark, _ => """{"status":"OK","queryCount":0}""")
      .groupedDaily(d).isEmpty)
    assert(new JsonEnvelopeClient(spark, _ => """{"status":"OK","results":[]}""")
      .groupedDaily(d).isEmpty)

    // an UNPARSEABLE body throws (reference response.json() raises): it must
    // fail the fetch — never masquerade as an empty trading day
    val ex = intercept[RuntimeException](new JsonEnvelopeClient(spark,
      _ => "<html>502 Bad Gateway</html>").groupedDaily(d))
    assert(ex.getMessage.contains("unparseable"), ex.getMessage)

    // but a VALID JSON envelope with one unconvertible typed field is NOT
    // corrupt (reference response.json() succeeds and the data loads)
    val lenient = s"""{"status":"OK","queryCount":"not-a-number","results":[""" +
      s"""{"T":"ENV9","t":${d.toEpochDay * 86400000L}}]}"""
    assert(new JsonEnvelopeClient(spark, _ => lenient).groupedDaily(d)
      .map(_.ticker) == Seq("ENV9"))

    // the corruption check and the bar decode share ONE parse: a single
    // from_json node in the decode plan
    locally {
      import spark.implicits._
      val probe = Seq("""{"status":"OK"}""").toDF("envelope")
      // analyzed plan: the optimizer constant-folds a literal envelope away
      for (df <- Seq(EnvelopeDecoder.decodeBars(probe),
          EnvelopeDecoder.corruptEnvelopes(probe))) {
        val plan = df.queryExecution.analyzed.toString
        assert("from_json".r.findAllMatchIn(plan).size == 1, plan)
      }
    }

    // a resultless fetch writes NO checkpoint (reference load.py:21-23): the
    // date stays un-completed and is re-fetched next run
    val emptyLedger = new CheckpointLedger(spark, tmp("ledgerempty") + "/ledger")
    val emptyJob = new IngestJob(spark,
      new JsonEnvelopeClient(spark, _ => """{"status":"OK","queryCount":0}"""),
      emptyLedger, tmp("rawempty"))
    val now0 = ZonedDateTime.of(2024, 7, 9, 18, 0, 0, 0, ZoneId.of("America/New_York"))
    val eo = emptyJob.run(now0, daysBack = 1)
    assert(eo.nonEmpty && eo.forall(_.status == "no_data"))
    assert(emptyLedger.completedDates().isEmpty)
    assert(emptyJob.run(now0, daysBack = 1).nonEmpty) // retried, not skipped

    // end-to-end: envelope transport → decode → normalize → raw append
    val job = new IngestJob(spark, client, ledger, rawPath)
    val now = ZonedDateTime.of(2024, 7, 9, 18, 0, 0, 0, ZoneId.of("America/New_York"))
    val out = job.run(now, daysBack = 1)
    assert(out.forall(_.status == "completed") && out.nonEmpty)
    val raw = spark.read.parquet(rawPath)
    assert(raw.count() == 2 * out.size)
    // missing optional vendor fields land as NULL (reference NaN → SQL NULL)
    assert(raw.filter(col("T") === "ENV2").count() ==
      raw.filter(col("T") === "ENV2" && col("VW").isNull && col("N").isNull).count())
    assert(raw.filter(col("T") === "ENV1").head().getAs[Double]("VW") == 10.5)
  }

  test("live HTTP transport: reference URL shape, retry policy, corrupt body fails the fetch") {
    import java.net.InetSocketAddress
    import java.util.concurrent.atomic.AtomicReference
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    // local stub server scripted as a queue of (status, body) responses;
    // status -1 = stall past the client timeout (the last entry repeats)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val script = new AtomicReference[List[(Int, String)]](Nil)
    server.createContext("/", { exchange: HttpExchange =>
      try {
        seen.add(exchange.getRequestURI.toString)
        val (status, body) = script.getAndUpdate(l => if (l.size > 1) l.tail else l).head
        if (status == -1) { Thread.sleep(800); exchange.sendResponseHeaders(204, -1) }
        else {
          val bytes = body.getBytes("UTF-8")
          exchange.sendResponseHeaders(status, bytes.length.toLong)
          exchange.getResponseBody.write(bytes)
        }
      } catch { case _: Exception => () } // client may have timed out already
      finally exchange.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val d = LocalDate.parse("2024-07-08")
      val good =
        s"""{"status":"OK","queryCount":1,"resultsCount":1,"adjusted":true,"results":[""" +
          s"""{"T":"HTT1","v":100.0,"vw":10.5,"o":10.0,"c":11.0,"h":11.5,"l":9.5,"n":7,""" +
          s""""t":${d.toEpochDay * 86400000L}}]}"""
      var sleeps = Vector.empty[Long]
      def mkClient(timeoutMs: Long = 10000L) = HttpMarketData.client(
        spark, base, "k123", timeoutMs, sleeper = ms => sleeps :+= ms)

      // happy path: decoded bars, and the URL/params are the reference's
      // construction (extraction.py:24-29)
      script.set(List((200, good)))
      val bars = mkClient().groupedDaily(d)
      assert(bars.map(_.ticker) == Seq("HTT1") && bars.head.vwap.contains(10.5))
      assert(seen.poll() ==
        "/v2/aggs/grouped/locale/us/market/stocks/2024-07-08?adjusted=true&apiKey=k123")
      // reserved characters in the key percent-encode (requests params parity)
      assert(HttpMarketData.groupedDailyUri("http://h", d, "a+b&c=d").getRawQuery
        == "adjusted=true&apiKey=a%2Bb%26c%3Dd")

      // 429 then success: one 60 s back-off
      sleeps = Vector.empty
      script.set(List((429, "slow down"), (200, good)))
      assert(mkClient().groupedDaily(d).size == 1)
      assert(sleeps == Vector(60000L))

      // 5xx then success: 5 s back-off
      sleeps = Vector.empty
      script.set(List((503, "oops"), (200, good)))
      assert(mkClient().groupedDaily(d).size == 1)
      assert(sleeps == Vector(5000L))

      // request timeout retries through the same 5 s branch
      sleeps = Vector.empty
      script.set(List((-1, ""), (200, good)))
      assert(mkClient(timeoutMs = 250L).groupedDaily(d).size == 1)
      assert(sleeps == Vector(5000L))

      // non-retryable 4xx aborts with no sleep
      sleeps = Vector.empty
      script.set(List((404, "nope")))
      intercept[RuntimeException](mkClient().groupedDaily(d))
      assert(sleeps.isEmpty)

      // a truncated 200 body fails the fetch (decode throws — reference
      // response.json() raises): no 'completed' checkpoint, and the SAME
      // date succeeds on the next run once the body is healthy
      script.set(List((200, good.dropRight(25))))
      val ledger = new CheckpointLedger(spark, tmp("ledgerhttp") + "/ledger")
      val job = new IngestJob(spark, mkClient(), ledger, tmp("rawhttp"))
      val now = ZonedDateTime.of(2024, 7, 9, 18, 0, 0, 0, ZoneId.of("America/New_York"))
      assert(job.run(now, 1).map(_.status) == Seq("failed"))
      assert(ledger.completedDates().isEmpty)
      script.set(List((200, good)))
      assert(job.run(now, 1).map(_.status) == Seq("completed"))
      assert(ledger.completedDates() == Set(d))
    } finally server.stop(0)
  }

  test("client wires from config: precedence, required key, default base URL") {
    import graft.ingest.HttpMarketData.{resolveConfig, ApiKeyVar, BaseUrlVar}
    // key from config, base URL defaulted (reference src/config.py:25-26)
    assert(resolveConfig(Map(ApiKeyVar -> "k1"), Map.empty) ==
      ("https://api.polygon.io", "k1"))
    // explicit config beats the environment (Variable.get over os.getenv)
    assert(resolveConfig(
      Map(BaseUrlVar -> "http://cfg", ApiKeyVar -> "k1"),
      Map(BaseUrlVar -> "http://env", ApiKeyVar -> "kenv")) ==
      ("http://cfg", "k1"))
    // environment alone suffices (.env local fallback)
    assert(resolveConfig(Map.empty,
      Map(BaseUrlVar -> "http://env", ApiKeyVar -> "k2")) ==
      ("http://env", "k2"))
    // a missing key fails loudly, naming the variable
    val e = intercept[IllegalStateException](resolveConfig(Map.empty, Map.empty))
    assert(e.getMessage.contains(ApiKeyVar))
    // an empty value counts as unset, not as an empty api key
    intercept[IllegalStateException](
      resolveConfig(Map(ApiKeyVar -> ""), Map.empty))

    // and the config-built client drives a real fetch end-to-end
    import java.net.InetSocketAddress
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val d = LocalDate.parse("2024-07-08")
    val good =
      s"""{"status":"OK","queryCount":1,"resultsCount":1,"adjusted":true,"results":[""" +
        s"""{"T":"CFG1","v":100.0,"vw":10.5,"o":10.0,"c":11.0,"h":11.5,"l":9.5,"n":7,""" +
        s""""t":${d.toEpochDay * 86400000L}}]}"""
    server.createContext("/", { exchange: HttpExchange =>
      try {
        seen.add(exchange.getRequestURI.toString)
        val bytes = good.getBytes("UTF-8")
        exchange.sendResponseHeaders(200, bytes.length.toLong)
        exchange.getResponseBody.write(bytes)
      } finally exchange.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val client = graft.ingest.HttpMarketData.fromConfig(spark,
        config = Map(BaseUrlVar -> base, ApiKeyVar -> "kcfg"),
        env = Map.empty)
      assert(client.groupedDaily(d).map(_.ticker) == Seq("CFG1"))
      assert(seen.poll() ==
        "/v2/aggs/grouped/locale/us/market/stocks/2024-07-08?adjusted=true&apiKey=kcfg")
    } finally server.stop(0)
  }

  test("failed fetch writes a failed checkpoint and later retries") {
    import FetchResult._
    val rawPath = tmp("raw2")
    val ledger = new CheckpointLedger(spark, tmp("ledger2") + "/ledger")
    val now = ZonedDateTime.of(2024, 7, 9, 18, 0, 0, 0, ZoneId.of("America/New_York"))
    var fail = true
    val flaky = new MarketDataClient {
      def groupedDaily(date: LocalDate): Seq[ApiBar] =
        if (fail) throw new RuntimeException("boom")
        else new FixtureClient(5).groupedDaily(date)
    }
    val job = new IngestJob(spark, flaky, ledger, rawPath)
    assert(job.run(now, 1).map(_.status) == Seq("failed"))
    assert(ledger.completedDates().isEmpty)
    fail = false
    assert(job.run(now, 1).map(_.status) == Seq("completed")) // failed date retried
  }

  test("partition MERGE: only touched dates rewritten, idempotent") {
    import spark.implicits._
    val path = tmp("merge") + "/t"
    val base = Seq(
      ("A", "2024-01-01", 1.0), ("A", "2024-01-02", 2.0), ("A", "2024-01-03", 3.0))
      .toDF("ticker", "trade_date", "close")
    base.write.partitionBy("trade_date").parquet(path)

    val slice = Seq(("A", "2024-01-03", 30.0), ("B", "2024-01-03", 5.0))
      .toDF("ticker", "trade_date", "close")
    MergeWriter.mergeByDatePartition(spark, slice, path)
    val after = spark.read.parquet(path)
    assert(after.count() == 4) // 2 untouched + 2 replaced
    assert(after.filter($"trade_date" === "2024-01-03").count() == 2)
    assert(after.filter($"close" === 3.0).count() == 0) // old partition content gone

    MergeWriter.mergeByDatePartition(spark, slice, path)
    assert(spark.read.parquet(path).count() == 4) // idempotent
  }

  test("pipeline DAG: topo order, view laziness, cycle detection") {
    import spark.implicits._
    import Pipeline._
    val store = tmp("store")
    val models = Seq(
      Model("mart", Seq("stg"), Table, clusterBy = Seq("k"),
        build = in => in("stg").groupBy("k").agg(sum("v").as("total"))),
      Model("stg", Seq("src"), View,
        build = in => in("src").filter($"v" > 0)),
      Model("src", Nil, View,
        build = _ => Seq(("a", 1), ("a", 2), ("b", -1), ("b", 4)).toDF("k", "v")))
    assert(topoOrder(models).map(_.name) == Seq("src", "stg", "mart"))
    val out = Pipeline.run(spark, models, store)
    assert(out("mart").orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("a", 3L), ("b", 4L)))
    assert(Files.exists(java.nio.file.Paths.get(s"$store/mart")))
    assert(!Files.exists(java.nio.file.Paths.get(s"$store/stg"))) // views never materialize

    val cyclic = Seq(
      Model("x", Seq("y"), View, build = in => in("y")),
      Model("y", Seq("x"), View, build = in => in("x")))
    intercept[IllegalArgumentException](topoOrder(cyclic))
  }

  test("scheduler: weekday-noon-ET cron fires, skips weekends, strict next") {
    import java.time.Duration
    val et = Scheduler.Zone
    def at(y: Int, m: Int, d: Int, h: Int, zone: ZoneId = et) =
      ZonedDateTime.of(y, m, d, h, 0, 0, 0, zone)

    // Wed 09:00 ET -> same-day noon; exactly noon -> Thu (strictly after)
    assert(Scheduler.nextFire(at(2025, 8, 6, 9)) == at(2025, 8, 6, 12))
    assert(Scheduler.nextFire(at(2025, 8, 6, 12)) == at(2025, 8, 7, 12))
    // Fri 13:00 / Sat / Sun -> Monday noon
    assert(Scheduler.nextFire(at(2025, 8, 8, 13)) == at(2025, 8, 11, 12))
    assert(Scheduler.nextFire(at(2025, 8, 9, 0)) == at(2025, 8, 11, 12))
    // foreign-zone clocks convert: Wed 15:00 UTC = 11:00 ET -> Wed noon ET
    assert(Scheduler.nextFire(at(2025, 8, 6, 15, ZoneId.of("UTC")))
      == at(2025, 8, 6, 12))

    // loop: fake clock advanced by the sleeper; 3 ticks = Wed, Thu, Fri noon
    var now = at(2025, 8, 6, 9)
    var sleeps = Vector.empty[Duration]
    val fired = Scheduler.runLoop(
      () => now, d => { sleeps :+= d; now = now.plus(d) }, ticks = 3)(identity)
    assert(fired.map(_._1) == Seq(at(2025, 8, 6, 12), at(2025, 8, 7, 12),
      at(2025, 8, 8, 12)))
    assert(sleeps == Vector(Duration.ofHours(3), Duration.ofHours(24),
      Duration.ofHours(24)))
  }

  test("scheduler drives IngestJob: catchup-free ticks, ledger keeps replays no-op") {
    import java.time.Duration
    val ledger = new CheckpointLedger(spark, tmp("ledger") + "/ledger")
    val job = new IngestJob(spark, new FixtureClient(5), ledger, tmp("raw"))
    // Fri 2024-07-05 09:00 ET; two ticks land Fri noon + Mon noon
    var now = ZonedDateTime.of(2024, 7, 5, 9, 0, 0, 0, Scheduler.Zone)
    val runs = Scheduler.runLoop(
      () => now, d => now = now.plus(d), ticks = 2)(fire => job.run(fire, daysBack = 1))
    // Fri-noon fire ingests Wed July 3 (July 4 closed); Mon-noon fire ingests Fri July 5
    assert(runs.map(_._2.map(o => (o.date.toString, o.status))) == Seq(
      Seq(("2024-07-03", "completed")), Seq(("2024-07-05", "completed"))))
    // a third tick covering already-ingested days is a ledger no-op
    val replay = job.run(now, daysBack = 3)
    assert(replay.isEmpty)
  }
}
