package graft

import graft.fuel.{FuelCleaning, FuelDashboard}

/** The dashboard twin renders the golden corpus into a
  * self-contained HTML file whose numbers match the BASELINE
  * standing-query values.
  */
class FuelDashboardSpec extends SparkSpecBase {

  private lazy val prices =
    FuelCleaning.cleanPrices(spark.read.json(resource("/fuel/prices.jsonl"))).valid
  private lazy val stations =
    FuelCleaning.cleanStations(spark.read.json(resource("/fuel/stations.jsonl"))).valid

  test("renders self-contained HTML with golden qBar values, legend, and station table") {
    val html = FuelDashboard.render(prices, stations, maxStations = 5, generatedAt = "test")
    // Self-contained: no external fetches.
    assert(!html.contains("http://") && !html.contains("https://cdn"))
    // Bar values = qBar golden (BASELINE.md): E10 average present with 2 dp.
    val e10 = fuel.FuelQueries.qBar(prices)
      .filter(org.apache.spark.sql.functions.col("fueltype") === "E10")
      .collect().head.getDouble(1)
    assert(html.contains(f"$e10%.2f"))
    // All three sections and both chart SVGs render.
    assert(html.contains("Average price per fuel type"))
    assert(html.contains("Price over time"))
    assert(html.contains("Latest prices per station"))
    assert("<svg".r.findAllIn(html).size >= 3) // bar + line + legend marks
    // Multi-series line: legend present (>= 2 fuel types in corpus).
    assert(html.contains("class=\"legend\""))
    // Station table capped as asked.
    assert("<tr><td>".r.findAllIn(html).size === 5)
    // Dark mode ships as its own stepped palette, not an auto-flip.
    assert(html.contains("prefers-color-scheme: dark") && html.contains("#3987e5"))
  }

  test("geo scatter: one dot per located station, single accent hue, hover payload") {
    val html = FuelDashboard.render(prices, stations, maxStations = 5, generatedAt = "test")
    assert(html.contains("Maps of service stations"))
    val nLocated = fuel.FuelQueries.qMap(stations, prices)
      .filter(org.apache.spark.sql.functions.col("location_latitude").isNotNull)
      .count()
    assert("class=\"geo\"".r.findAllIn(html).size === nLocated)
    // hover = the reference's hover_data: name, brand, address, prices
    assert(html.contains("<title>"))
    // single fixed hue, both schemes
    assert(html.contains("#e34948") && html.contains("#e66767"))
  }

  test("interactivity ships dependency-free: series toggles, table filter, optional live refresh") {
    val html = FuelDashboard.render(prices, stations, maxStations = 5, generatedAt = "test")
    // legend keys are toggle targets wired by the inline script
    assert(html.contains("data-series=\"s0\""))
    assert(html.contains("classList.toggle"))
    // client-side station filter input + handler
    assert(html.contains("id=\"stfilter\"") && html.contains("addEventListener('input'"))
    // still fully self-contained (no external script/src fetches)
    assert(!html.contains("src=") && !html.contains("http://"))
    // no refresh by default; per-tick republish opts into browser polling
    assert(!html.contains("http-equiv"))
    val live = FuelDashboard.render(prices, stations, maxStations = 5,
      generatedAt = "test", refreshSecs = 2)
    assert(live.contains("""<meta http-equiv="refresh" content="2">"""))
  }

  test("writeAtomic publishes whole files under the final name") {
    val dir = java.nio.file.Files.createTempDirectory("dash").toString
    val p = s"$dir/index.html"
    FuelDashboard.writeAtomic(p, "<html>v1</html>")
    FuelDashboard.writeAtomic(p, "<html>v2</html>")
    val content = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
    assert(content === "<html>v2</html>")
    // no temp leftovers: exactly the published file remains
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    try assert(listing.count() === 1) finally listing.close()
  }

  test("push server: serves injected SSE page and pushes refresh on file change") {
    val tmp = java.nio.file.Files.createTempFile("graft_dash", ".html")
    java.nio.file.Files.writeString(tmp,
      """<!doctype html><html><head><meta http-equiv="refresh" content="2"></head>""" +
        """<body>v1</body></html>""")
    val srv = new fuel.FuelDashboardServer(tmp, port = 0, watchMillis = 50L)
    try {
      // GET /: content served, meta-refresh poll stripped, SSE script injected
      val page = new String(
        new java.net.URL(srv.address + "/").openStream().readAllBytes(), "UTF-8")
      assert(page.contains("v1"))
      assert(!page.contains("http-equiv"), "the poll tag must be stripped")
      assert(page.contains("EventSource('/events')"))
      // /events: one idle connection; a republish pushes `refresh`
      val conn = new java.net.URL(srv.address + "/events").openConnection()
      conn.setReadTimeout(5000)
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(conn.getInputStream, "UTF-8"))
      assert(in.readLine() === ": connected")
      // atomic republish, the pipeline's publication contract
      val staged = java.nio.file.Files.createTempFile("graft_dash_stage", ".html")
      java.nio.file.Files.writeString(staged, "<html><body>v2</body></html>")
      java.nio.file.Files.move(staged, tmp,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      var line = in.readLine()
      while (line != null && line.isEmpty) line = in.readLine()
      assert(line === "data: refresh", s"expected SSE refresh push, got '$line'")
      // the served page now reflects the new snapshot
      val page2 = new String(
        new java.net.URL(srv.address + "/").openStream().readAllBytes(), "UTF-8")
      assert(page2.contains("v2"))
    } finally srv.close()
  }
}
