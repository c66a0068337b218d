package graft.export

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.binning.{BinAxis, BinnedCube, Binning}

/** Cube exporters (SURVEY.md §2.2 K1-K4).
  *
  * The reference writes xarray cubes to HDF5 / ImageJ-TIFF / NeXus
  * (`sed/io`). The engine ships:
  *
  *  - sparse-parquet + JSON axes sidecar: lossless, scalable, readable by
  *    any engine (the 100 TB-native format — cubes stay distributed);
  *  - REAL HDF5 in the reference's own container layout
  *    (`binned/BinnedData` + `axes/ax{i}`, `sed/io/hdf5.py:84-190`) via
  *    the dependency-free [[graft.loader.Hdf5Minimal]] writer — h5py-
  *    compatible contiguous datasets, so `load_h5` can read our cubes
  *    ([[writeH5]]/[[readH5]]);
  *  - raw little-endian binary + JSON header: a numpy-trivial dense dump
  *    (`np.fromfile(...).reshape(shape)`), kept for zero-tooling
  *    interchange ([[writeDense]]).
  *
  *  - REAL NeXus/NXmpes HDF5 (K3, `sed/io/nexus.py:13-47` — the
  *    reference shells out to pynxtools; here the NXmpes-shaped tree is
  *    emitted directly with the same minimal writer): root `@default`,
  *    `entry:NXentry` with a `definition` string dataset, `data:NXdata`
  *    with `@signal`/`@axes`/`@{ax}_indices` plot annotations
  *    ([[writeNexus]]/[[readNexus]]). A JSON metadata sidecar is still
  *    written next to it for non-HDF5 consumers.
  */
object CubeIO {

  import graft.loader.Hdf5Minimal

  /** K1: write the dense cube as a real HDF5 file in the reference's
    * layout (`sed/io/hdf5.py:99-129` `to_h5`): `binned/BinnedData` holds
    * the row-major counts with `units`/`long_name` attributes, `axes/ax{i}`
    * hold the bin-center coordinates with a `name` attribute, and any
    * remaining cube attrs ride on a `metadata` group.
    */
  def writeH5(cube: BinnedCube, path: String): Unit =
    writeH5(cube, path, compress = false)

  /** First-axis rows per chunk for a compressed cube: ~1 MiB slabs
    * (`2^17` int64 elements), but never more than the writer's
    * 4096-chunk B-tree cap — a long first axis grows the slab instead
    * of failing `writeChunkedDataset`'s chunk-count require.
    */
  private[export] def chunkRows(head: Long, sliceElems: Long): Long = {
    val target = math.max(1L, math.min(head, (1L << 17) / sliceElems))
    math.max(target, (head + 4095) / 4096)
  }

  /** [[writeH5]] with an optional chunked+gzip payload (h5py
    * `chunks=..., compression="gzip"`): count cubes are mostly sparse,
    * so a large export compresses heavily and h5py consumers can read it
    * slice-at-a-time instead of as one contiguous blob. Chunks split the
    * FIRST axis (row-major slabs — the natural slice direction), sized
    * ≤ ~1 MiB each ([[chunkRows]]).
    */
  def writeH5(cube: BinnedCube, path: String, compress: Boolean): Unit = {
    val shape = cube.shape.map(_.toLong)
    val chunk: Option[Seq[Long]] =
      if (!compress) None
      else Some(chunkRows(shape.head, shape.tail.product.max(1L)) +: shape.tail)
    val binned = Hdf5Minimal.Group(datasets = Seq(
      Hdf5Minimal.Dataset("BinnedData", Hdf5Minimal.I64(cube.data),
        attrs = cube.attrs.view.filterKeys(Set("units", "long_name")).toMap,
        shape = Some(shape),
        chunkDims = chunk,
        deflateLevel = if (compress) Some(6) else None)))
    val axes = Hdf5Minimal.Group(datasets =
      cube.axisNames.zip(cube.axes).zipWithIndex.map { case ((n, c), i) =>
        Hdf5Minimal.Dataset(s"ax$i", Hdf5Minimal.F64(c), Map("name" -> n))
      })
    val meta = cube.attrs -- Seq("units", "long_name")
    val subgroups = Seq("binned" -> binned, "axes" -> axes) ++
      (if (meta.nonEmpty) Seq("metadata" -> Hdf5Minimal.Group(attrs = meta)) else Nil)
    Hdf5Minimal.write(path, Hdf5Minimal.Group(subgroups = subgroups))
  }

  /** Round-trip loader for [[writeH5]] (mirrors `load_h5`,
    * `sed/io/hdf5.py:133-190`).
    */
  def readH5(path: String): BinnedCube = {
    val root = Hdf5Minimal.read(path)
    val bd = root.dataset("binned/BinnedData")
    // numeric order on the axN suffix: lexicographic would slot ax10
    // between ax1 and ax2 and silently mislabel cubes of ≥11 dimensions
    val axDs = root.group("axes").datasets
      .sortBy(d => d.name.drop(2).toIntOption.getOrElse(Int.MaxValue))
    val meta =
      if (root.hasChild("metadata")) root.group("metadata").attrs
      else Map.empty[String, String]
    BinnedCube(
      axDs.map(_.attrs("name")),
      axDs.map(_.data.asDoubles),
      bd.data.asLongs,
      bd.dims.map(_.toInt),
      meta ++ bd.attrs.view.filterKeys(Set("units", "long_name")).toMap,
    )
  }

  /** K3: write the cube as a NeXus-style HDF5 file following the NXmpes
    * application definition's plottable-data skeleton
    * (`sed/io/nexus.py:13-47` routes through pynxtools to produce the
    * same tree):
    *
    * {{{
    * /                  @default="entry"
    * /entry             @NX_class="NXentry", @default="data"
    *   definition       = "NXmpes"            (string dataset)
    *   title            = attrs("title")       (if present)
    *   start_time       = attrs("start_time")  (if present)
    *   /user /instrument /sample /process     (NXuser/NXinstrument/
    *                    NXsample/NXprocess — the template group set of
    *                    the reference's NXmpes_config.json)
    *   /data            @NX_class="NXdata", @signal="data",
    *                    @axes="ax0:ax1:…" (legacy colon form — the
    *                    minimal writer has scalar string attrs only),
    *                    @{name}_indices per axis
    *     data           int64 counts, shape = cube.shape
    *     {axisName}     float64 bin centers, @units if known
    * }}}
    *
    * Axis units ride in from `cube.attrs("units.<axisName>")`; remaining
    * attrs land on `/entry/data@…`. Round-trips via [[readNexus]].
    */
  def writeNexus(cube: BinnedCube, path: String): Unit =
    writeNexus(cube, path, Map.empty[String, Any])

  /** Convert one metadata level to an HDF5 group: nested maps recurse as
    * `NXcollection` subgroups (pynxtools' class for free-form metadata),
    * numeric leaves write as scalar F64/I64 datasets, numeric sequences
    * as F64 arrays, everything else as strings. Deterministic (sorted)
    * member order so repeated exports are byte-stable.
    */
  private def metaGroup(m: Map[String, Any], cls: String): Hdf5Minimal.Group = {
    val (subs, leaves) = m.toSeq.sortBy(_._1).partition(_._2.isInstanceOf[Map[_, _]])
    Hdf5Minimal.Group(
      datasets = leaves.map { case (k, v) =>
        v match {
          case d: Double => Hdf5Minimal.Dataset(k, Hdf5Minimal.F64(Array(d)))
          case f: Float => Hdf5Minimal.Dataset(k, Hdf5Minimal.F64(Array(f.toDouble)))
          case i: Int => Hdf5Minimal.Dataset(k, Hdf5Minimal.I64(Array(i.toLong)))
          case l: Long => Hdf5Minimal.Dataset(k, Hdf5Minimal.I64(Array(l)))
          // fixed-width integral sequences keep exactness as I64;
          // Float/Double sequences widen losslessly to F64. Arbitrary-
          // precision types (BigInt/BigDecimal — >53 significant bits
          // would corrupt through doubleValue) and mixed/non-numeric
          // sequences keep the exact comma-joined string form.
          case s: Seq[_] if s.nonEmpty && s.forall(e =>
              e.isInstanceOf[Byte] || e.isInstanceOf[Short] ||
                e.isInstanceOf[Int] || e.isInstanceOf[Long]) =>
            Hdf5Minimal.Dataset(k, Hdf5Minimal.I64(
              s.map(_.asInstanceOf[Number].longValue).toArray))
          case s: Seq[_] if s.nonEmpty && s.forall(e =>
              e.isInstanceOf[Float] || e.isInstanceOf[Double]) =>
            Hdf5Minimal.Dataset(k, Hdf5Minimal.F64(
              s.map(_.asInstanceOf[Number].doubleValue).toArray))
          case s: Seq[_] => Hdf5Minimal.Dataset(k,
            Hdf5Minimal.Str(s.map(String.valueOf).mkString(",")))
          case other => Hdf5Minimal.Dataset(k,
            Hdf5Minimal.Str(String.valueOf(other)))
        }
      },
      subgroups = subs.map { case (k, v) =>
        k -> metaGroup(v.asInstanceOf[Map[String, Any]], "NXcollection") },
      attrs = Map("NX_class" -> cls))
  }

  /** [[writeNexus]] with metadata populated into the NXmpes template
    * groups (the role pynxtools' config template plays for the reference,
    * `sed/io/nexus.py:13-47`): `metadata` keys `user` / `instrument` /
    * `sample` / `process` fill their groups (values must be nested
    * `Map[String, Any]`; a scalar under a template key writes as a
    * `value` dataset), and every OTHER top-level key lands under
    * `process` — the NXprocess group is NeXus' home for provenance, so a
    * [[graft.Processor]] metadata tree (calibration entries keyed by
    * step name) drops in unchanged. With empty metadata the output is
    * byte-identical to the no-metadata overload (golden-pinned).
    */
  def writeNexus(cube: BinnedCube, path: String,
      metadata: Map[String, Any]): Unit = {
    val axisUnits: Map[String, String] =
      cube.attrs.collect { case (k, v) if k.startsWith("units.") =>
        k.stripPrefix("units.") -> v }
    val plain = cube.attrs.view.filterKeys(k =>
      !k.startsWith("units.") && k != "title" && k != "start_time")
    val indices = cube.axisNames.zipWithIndex.map { case (n, i) =>
      s"${n}_indices" -> i.toString }
    val dataGroup = Hdf5Minimal.Group(
      datasets =
        Hdf5Minimal.Dataset("data", Hdf5Minimal.I64(cube.data),
          shape = Some(cube.shape.map(_.toLong))) +:
        cube.axisNames.zip(cube.axes).map { case (n, c) =>
          Hdf5Minimal.Dataset(n, Hdf5Minimal.F64(c),
            attrs = axisUnits.get(n).map("units" -> _).toMap)
        },
      // pass-through attrs FIRST: a cube attr named signal/axes/
      // NX_class/<axis>_indices must not clobber the structural plot
      // annotations (readNexus would chase a bogus axis name)
      attrs = plain.toMap ++ (Map(
        "NX_class" -> "NXdata",
        "signal" -> "data",
        "axes" -> cube.axisNames.mkString(":"),
      ) ++ indices),
    )
    val entryDatasets =
      Hdf5Minimal.Dataset("definition", Hdf5Minimal.Str("NXmpes")) +:
        (cube.attrs.get("title").map(t =>
          Hdf5Minimal.Dataset("title", Hdf5Minimal.Str(t))).toSeq ++
          cube.attrs.get("start_time").map(t =>
            Hdf5Minimal.Dataset("start_time", Hdf5Minimal.Str(t))).toSeq)
    // the standard NXmpes metadata groups (the group set the reference's
    // pynxtools config template creates — NXmpes_config.json: USER[user],
    // INSTRUMENT[instrument], SAMPLE[sample], PROCESS_MPES[process]);
    // written empty unless metadata rides in, so NeXus-aware consumers
    // find the expected tree shape
    val templates = Seq("user" -> "NXuser", "instrument" -> "NXinstrument",
      "sample" -> "NXsample", "process" -> "NXprocess")
    val templateNames = templates.map(_._1).toSet
    val extras: Map[String, Any] =
      metadata.view.filterKeys(k => !templateNames.contains(k)).toMap
    val metaGroups = templates.map { case (name, cls) =>
      val own: Map[String, Any] = metadata.get(name) match {
        case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
        case Some(scalar) => Map("value" -> scalar)
        case None => Map.empty
      }
      name -> metaGroup(if (name == "process") own ++ extras else own, cls)
    }
    val entry = Hdf5Minimal.Group(
      datasets = entryDatasets,
      subgroups = ("data" -> dataGroup) +: metaGroups,
      attrs = Map("NX_class" -> "NXentry", "default" -> "data"),
    )
    Hdf5Minimal.write(path, Hdf5Minimal.Group(
      subgroups = Seq("entry" -> entry),
      attrs = Map("default" -> "entry")))
  }

  /** Units pynxtools accepts for the NX unit categories of the axes
    * NXmpes cubes carry (light mirror of its pint-based category check).
    */
  private val AxisUnitCategories: Map[String, Set[String]] = Map(
    "energy" -> Set("eV", "meV", "keV", "J"),
    "delay" -> Set("s", "ms", "us", "ns", "ps", "fs", "as"),
    "kx" -> Set("1/A", "1/angstrom", "1/nm"),
    "ky" -> Set("1/A", "1/angstrom", "1/nm"),
  )

  /** Validation against the NXmpes application-definition skeleton (the
    * checks `pynxtools.convert` enforces for the plottable part,
    * `sed/io/nexus.py:13-47`): default-chain resolution, NXentry /
    * NXdata classes, `definition = NXmpes`, signal/axes presence, per-
    * axis `<axis>_indices` attrs that are integers in range, axis rank 1
    * and length agreement with the signal dimension they index, and
    * `units` on every axis. `strict = true` adds the application-
    * definition requirements beyond the plottable skeleton: `title` and
    * an ISO-8601 `start_time` on the entry, the NXmpes template group
    * set (`user`/`instrument`/`sample`/`process` with their NX_class),
    * and axis-unit CATEGORY agreement (an `energy` axis in 1/A is a
    * wiring bug pynxtools would reject). Returns the violations (empty =
    * valid) so callers choose between failing and reporting.
    */
  def validateNexus(path: String, strict: Boolean = false): Seq[String] = {
    val errs = scala.collection.mutable.ArrayBuffer[String]()
    val root = Hdf5Minimal.read(path)
    val entryName = root.attrs.getOrElse("default", "entry")
    if (!root.hasChild(entryName)) return Seq(s"root @default -> missing group '$entryName'")
    val entry = root.group(entryName)
    if (!entry.attrs.get("NX_class").contains("NXentry"))
      errs += s"/$entryName@NX_class must be NXentry (got ${entry.attrs.get("NX_class")})"
    if (strict) {
      if (!entry.datasets.exists(_.name == "title"))
        errs += s"/$entryName/title required by NXmpes"
      entry.datasets.find(_.name == "start_time") match {
        case None => errs += s"/$entryName/start_time required by NXmpes"
        case Some(d) => d.data match {
          case Hdf5Minimal.Str(t) =>
            try { java.time.OffsetDateTime.parse(t); () }
            catch { case _: Exception =>
              errs += s"/$entryName/start_time '$t' is not ISO-8601 (NX_DATE_TIME)"
            }
          case other =>
            errs += s"/$entryName/start_time must be a string (got $other)"
        }
      }
      Seq("user" -> "NXuser", "instrument" -> "NXinstrument",
        "sample" -> "NXsample", "process" -> "NXprocess").foreach {
        case (name, cls) =>
          if (!entry.hasChild(name))
            errs += s"/$entryName/$name ($cls) group required by NXmpes"
          else if (!entry.group(name).attrs.get("NX_class").contains(cls))
            errs += s"/$entryName/$name@NX_class must be $cls " +
              s"(got ${entry.group(name).attrs.get("NX_class")})"
      }
    }
    entry.datasets.find(_.name == "definition") match {
      case None => errs += s"/$entryName/definition dataset missing"
      case Some(d) => d.data match {
        case Hdf5Minimal.Str("NXmpes") =>
        case other => errs += s"/$entryName/definition must be the string NXmpes (got $other)"
      }
    }
    val dataName = entry.attrs.getOrElse("default", "data")
    if (!entry.hasChild(dataName))
      return (errs += s"/$entryName@default -> missing group '$dataName'").toSeq
    val data = entry.group(dataName)
    val dpath = s"/$entryName/$dataName"
    if (!data.attrs.get("NX_class").contains("NXdata"))
      errs += s"$dpath@NX_class must be NXdata (got ${data.attrs.get("NX_class")})"
    val signalDims: Option[Seq[Long]] = data.attrs.get("signal") match {
      case None => errs += s"$dpath@signal attribute missing"; None
      case Some(sig) if !data.datasets.exists(_.name == sig) =>
        errs += s"$dpath@signal names missing dataset '$sig'"; None
      case Some(sig) => Some(data.dataset(sig).dims)
    }
    data.attrs.get("axes") match {
      case None => errs += s"$dpath@axes attribute missing"
      case Some(axes) =>
        val names = axes.split(":").toSeq
        signalDims.foreach { dims =>
          if (names.length != dims.length)
            errs += s"$dpath@axes lists ${names.length} axes for a rank-${dims.length} signal"
        }
        names.foreach { n =>
          if (!data.datasets.exists(_.name == n))
            errs += s"$dpath: axis dataset '$n' missing"
          else {
            val ax = data.dataset(n)
            if (ax.dims.length != 1)
              errs += s"$dpath/$n: axis must be 1-D (got rank ${ax.dims.length})"
            if (!ax.attrs.contains("units"))
              errs += s"$dpath/$n@units missing"
            else if (strict) AxisUnitCategories.get(n).foreach { allowed =>
              val u = ax.attrs("units")
              if (!allowed.contains(u))
                errs += s"$dpath/$n@units '$u' is not a valid unit for " +
                  s"the $n axis category (expected one of ${allowed.mkString("/")})"
            }
            data.attrs.get(s"${n}_indices") match {
              case None => errs += s"$dpath@${n}_indices attribute missing"
              case Some(v) => v.toIntOption match {
                case None => errs += s"$dpath@${n}_indices must be an integer (got '$v')"
                case Some(i) => signalDims.foreach { dims =>
                  if (i < 0 || i >= dims.length)
                    errs += s"$dpath@${n}_indices=$i out of range for rank ${dims.length}"
                  else if (ax.dims.head != dims(i))
                    errs += s"$dpath/$n has ${ax.dims.head} points but signal dim $i is ${dims(i)}"
                }
              }
            }
          }
        }
    }
    errs.toSeq
  }

  /** Round-trip loader for [[writeNexus]]: follows `@default` →
    * `@signal`/`@axes` like a NeXus-aware plotter would.
    */
  def readNexus(path: String): BinnedCube = {
    val root = Hdf5Minimal.read(path)
    val entry = root.group(root.attrs.getOrElse("default", "entry"))
    val data = entry.group(entry.attrs.getOrElse("default", "data"))
    require(entry.dataset("definition").data.asInstanceOf[Hdf5Minimal.Str].value == "NXmpes",
      s"$path: not an NXmpes file")
    val signal = data.dataset(data.attrs("signal"))
    val axisNames = data.attrs("axes").split(":").toSeq
    val axisDs = axisNames.map(data.dataset)
    val axisUnits = axisDs.flatMap(d => d.attrs.get("units").map(s"units.${d.name}" -> _))
    val reserved = Set("NX_class", "signal", "axes") ++ axisNames.map(_ + "_indices")
    val extra = data.attrs.view.filterKeys(!reserved.contains(_)).toMap
    val entryStrings = Seq("title", "start_time").flatMap(n =>
      entry.datasets.find(_.name == n)
        .map(d => n -> d.data.asInstanceOf[Hdf5Minimal.Str].value))
    BinnedCube(
      axisNames,
      axisDs.map(_.data.asDoubles),
      signal.data.asLongs,
      signal.dims.map(_.toInt),
      extra ++ axisUnits ++ entryStrings,
    )
  }

  /** K4-style distributed export: the sparse histogram DataFrame plus an
    * `_axes.json` sidecar carrying names/centers/attrs.
    */
  def writeSparse(
      hist: DataFrame,
      axes: Seq[BinAxis],
      path: String,
      attrs: Map[String, String] = Map.empty,
  ): Unit = {
    hist.write.mode("overwrite").parquet(path)
    Files.writeString(Paths.get(path, "_axes.json"), axesJson(axes, attrs))
  }

  /** Reload a sparse cube export as (DataFrame, axes-JSON). */
  def readSparse(spark: SparkSession, path: String): (DataFrame, String) =
    (spark.read.parquet(path), Files.readString(Paths.get(path, "_axes.json")))

  /** K1-equivalent dense dump: `<path>.bin` (row-major little-endian
    * int64) + `<path>.json` header with shape/axes/attrs; round-trips via
    * [[readDense]].
    */
  def writeDense(cube: BinnedCube, path: String): Unit = {
    // slab-streamed: a whole-cube buffer would spike 8 B/cell transient
    // memory and overflow Int at 2^28 cells (the densify cap is 2e8)
    val out = Files.newOutputStream(Paths.get(path + ".bin"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
    try {
      val slab = ByteBuffer.allocate(1 << 20).order(ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < cube.data.length) {
        slab.clear()
        val n = math.min(cube.data.length - i, slab.capacity() / 8)
        var j = 0
        while (j < n) { slab.putLong(cube.data(i + j)); j += 1 }
        out.write(slab.array(), 0, n * 8)
        i += n
      }
    } finally out.close()
    val axes = cube.axisNames.zip(cube.axes)
    val json =
      s"""{"shape": [${cube.shape.mkString(", ")}],
         | "dtype": "int64", "order": "C",
         | "axes": {${axes.map { case (n, c) =>
          s""""${jsonEscape(n)}": [${c.mkString(", ")}]"""
        }.mkString(", ")}},
         | "attrs": {${cube.attrs.map { case (k, v) =>
          s""""${jsonEscape(k)}": "${jsonEscape(v)}"""" }.mkString(", ")}}}""".stripMargin
    Files.writeString(Paths.get(path + ".json"), json)
  }

  /** Minimal JSON string escape (quotes, backslashes, control chars) —
    * an attr value containing `"` would otherwise emit a malformed
    * header that numpy-side consumers and [[readDense]] cannot parse.
    */
  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Round-trip loader for [[writeDense]] (shape/axes parsed from the
    * header, data from the raw buffer).
    */
  def readDense(path: String): BinnedCube = {
    val header = Files.readString(Paths.get(path + ".json")).replaceAll("\\s+", " ")
    def arr(name: String): Array[Double] = {
      // quote the name: an axis named e.g. "p(x)" must match literally,
      // not as a regex group
      val m = (s""""${java.util.regex.Pattern.quote(name)}": \\[([^\\]]*)\\]""")
        .r.findFirstMatchIn(header)
      m.get.group(1).split(",").map(_.trim.toDouble)
    }
    val shape = arr("shape").map(_.toInt).toSeq
    val axisNames = """"axes": \{(.*)\}, "attrs"""".r
      .findFirstMatchIn(header).get.group(1)
      // any non-quote run: \w+ silently DROPPED axis names containing
      // '-', '.', etc., mis-assembling the cube on reload
      .split("\\]").flatMap(s => """"([^"]+)": \[""".r.findFirstMatchIn(s).map(_.group(1)))
      .toSeq
    val axes = axisNames.map(arr)
    val bytes = Files.readAllBytes(Paths.get(path + ".bin"))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val data = Array.fill(bytes.length / 8)(buf.getLong)
    BinnedCube(axisNames, axes, data, shape)
  }

  private def axesJson(axes: Seq[BinAxis], attrs: Map[String, String]): String = {
    val ax = axes.map { a =>
      s""""${jsonEscape(a.column)}": {"idx_column": "${jsonEscape(Binning.idxName(a))}", "centers": [${a.centers.mkString(", ")}]}"""
    }.mkString(", ")
    val at = attrs.map { case (k, v) =>
      s""""${jsonEscape(k)}": "${jsonEscape(v)}"""" }.mkString(", ")
    s"""{"axes": {$ax}, "attrs": {$at}}"""
  }
}
