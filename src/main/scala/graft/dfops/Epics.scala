package graft.dfops

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EPICS archiver variant of T15 `add_time_stamped_data`
  * (`sed/core/processor.py:2007-2074` and `get_archiver_data`,
  * `sed/core/processor.py:2076-2101`): fetch a channel's
  * timestamp/value series from an Archiver Appliance data-retrieval
  * endpoint and interpolate it onto the event (or timed) table through
  * the same codegen'd [[DfOps.addTimeStampedData]] core.
  *
  * The HTTP fetch sits behind [[Epics.ArchiverClient]] so offline
  * clusters and tests plug a local source ([[Epics.fromFile]]) serving
  * the identical JSON payload — the URL construction, payload decode,
  * ±margin window, and interpolation path are byte-for-byte the same
  * code either way.
  */
object Epics {

  /** One archiver series: parallel epoch-second timestamps and values. */
  trait ArchiverClient {
    def fetch(channel: String, tsFrom: Double, tsTo: Double): (Array[Double], Array[Double])
  }

  /** The reference's request format (`processor.py:2094-2096`):
    * `{url}{channel}&from={isoFrom}Z&to={isoTo}Z` with UTC second
    * precision-preserving ISO-8601 instants.
    */
  def requestUrl(archiverUrl: String, channel: String, tsFrom: Double, tsTo: Double): String = {
    def iso(ts: Double): String = java.time.LocalDateTime.ofEpochSecond(
      // the fraction can round up to a full second for ts within ~0.5 ns
      // of the next tick — clamp, or ofEpochSecond throws DateTimeException
      math.floor(ts).toLong,
      math.min(((ts - math.floor(ts)) * 1e9).round, 999999999L).toInt,
      java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ISO_LOCAL_DATE_TIME)
    s"$archiverUrl$channel&from=${iso(tsFrom)}Z&to=${iso(tsTo)}Z"
  }

  /** Decode the archiver JSON payload
    * `[{"data": [{"secs": s, "nanos": n, "val": v}, ...]}]` into
    * (timestamps, values) — `secs + nanos*1e-9` exactly as the reference.
    */
  def parsePayload(json: String): (Array[Double], Array[Double]) = {
    val root = new ObjectMapper().readTree(json)
    // an unarchived / typo'd channel answers `[]` — surface that as the
    // empty series (callers name the channel in their error), not an NPE
    if (root == null || !root.isArray || root.size() == 0 ||
        root.get(0).get("data") == null)
      return (Array.empty[Double], Array.empty[Double])
    val data = root.get(0).get("data")
    val n = data.size()
    val ts = new Array[Double](n)
    val vals = new Array[Double](n)
    (0 until n).foreach { i =>
      val e = data.get(i)
      ts(i) = e.get("secs").asDouble() + e.get("nanos").asDouble() * 1e-9
      vals(i) = e.get("val").asDouble()
    }
    (ts, vals)
  }

  /** Live client against a real archiver data-retrieval endpoint.
    * Connect/read timeouts default to 10 s — a beamline network hiccup
    * must fail the fetch loudly, not hang the driver forever.
    */
  def fromUrl(archiverUrl: String, timeoutMs: Int = 10000): ArchiverClient =
    (channel: String, tsFrom: Double, tsTo: Double) => {
      val url = new java.net.URL(requestUrl(archiverUrl, channel, tsFrom, tsTo))
      val conn = url.openConnection()
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setRequestProperty("Accept", "application/json")
      val in = conn.getInputStream
      try parsePayload(new String(in.readAllBytes(), "UTF-8"))
      finally in.close()
    }

  /** Offline client serving the same payload from a local JSON file
    * (fixture servers, air-gapped clusters, tests). The requested window
    * still filters the series, so behavior matches the live client on an
    * archiver that returned the full history.
    */
  def fromFile(path: String): ArchiverClient =
    (channel: String, tsFrom: Double, tsTo: Double) => {
      val (ts, vals) = parsePayload(java.nio.file.Files.readString(
        java.nio.file.Paths.get(path)))
      val keep = ts.indices.filter(i => ts(i) >= tsFrom && ts(i) <= tsTo)
      (keep.map(ts).toArray, keep.map(vals).toArray)
    }

  /** Fetch `channel` over the table's own time range (±`marginSec`, the
    * reference's ±5 s safety margin mirroring
    * `MpesLoader.get_start_and_end_time`) and interpolate it onto
    * `destColumn`. One tiny min/max aggregation derives the window; the
    * series then applies through the codegen'd piecewise-linear core —
    * no UDF, no join.
    */
  def addArchiverData(
      df: DataFrame,
      destColumn: String,
      tsColumn: String,
      client: ArchiverClient,
      channel: String,
      marginSec: Double = 5.0,
  ): DataFrame = {
    val range = df.agg(
      min(col(tsColumn)).cast("double"), max(col(tsColumn)).cast("double")).head()
    require(!range.isNullAt(0), s"no rows / all-null $tsColumn — nothing to attach to")
    val (tsRaw, valsRaw) = client.fetch(
      channel, range.getDouble(0) - marginSec, range.getDouble(1) + marginSec)
    require(tsRaw.nonEmpty, s"archiver returned no samples for $channel")
    // real archiver streams can repeat a timestamp (coalesced writes) —
    // np.interp tolerates that; the strict piecewise kernel requires
    // ascending knots, so keep the LAST sample per timestamp
    val dedup = tsRaw.zip(valsRaw).foldLeft(
      List.empty[(Double, Double)]) {
      case (acc @ ((pt, _) :: rest), (t, v)) =>
        if (t == pt) (t, v) :: rest else (t, v) :: acc
      case (Nil, tv) => tv :: Nil
    }.reverse
    val (ts, vals) = (dedup.map(_._1).toArray, dedup.map(_._2).toArray)
    // a single archived sample in the window means the PV was constant
    // there — np.interp returns that constant; the 2-knot kernel can't
    if (ts.length == 1)
      df.withColumn(destColumn, lit(vals(0)))
    else DfOps.addTimeStampedData(df, destColumn, tsColumn, ts, vals)
  }
}
