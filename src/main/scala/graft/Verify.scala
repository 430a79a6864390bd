package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Accept both positional (`<sfDir> <outDir> [names]`) and flag
    // (`--outdir <path>`) styles: a prior invocation passed `--outdir` as a
    // positional token and this main happily created a directory literally
    // named `--outdir`. Only the KNOWN flags are accepted, and each must
    // have a value: a typo'd `--outdirs /x` or a trailing lone `--outdir`
    // fails fast instead of silently swallowing/shifting tokens.
    val knownFlags = Set("sfdir", "outdir", "only")
    val (flags, positional) = {
      var fl = Map.empty[String, String]
      val pos = collection.mutable.Buffer.empty[String]
      var i = 0
      while (i < args.length) {
        if (args(i).startsWith("--")) {
          val name = args(i).drop(2)
          require(knownFlags.contains(name),
            s"unknown flag --$name (known: ${knownFlags.toSeq.sorted.mkString(", ")})")
          require(i + 1 < args.length, s"flag --$name requires a value")
          fl += (name -> args(i + 1)); i += 2
        } else { pos += args(i); i += 1 }
      }
      (fl, pos.toSeq)
    }
    val sfDir = flags.getOrElse("sfdir", positional.headOption.getOrElse(
      sys.error("usage: Verify <sfDir> <outDir> [q1,q2,...] (or --sfdir/--outdir)")))
    val outDir = flags.getOrElse("outdir", positional.lift(1).getOrElse(
      sys.error("usage: Verify <sfDir> <outDir> [q1,q2,...] (or --sfdir/--outdir)")))
    require(new java.io.File(sfDir).isDirectory, s"sfDir not a directory: $sfDir")
    // optional query-name filter (dev use; the driver always invokes with
    // two args = all queries)
    val only: Option[Set[String]] =
      flags.get("only").orElse(positional.lift(2)).map(_.split(',').toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Gate metrics for the no_oracle queries: recomputed here so the
    // numbers land in the round archive (outDir + repo GATES.json), not
    // only in test logs. Failure is non-fatal — a gate problem must not
    // zero the whole correctness dump.
    try {
      val gates = tools.Gates.json(tools.Gates.compute(spark, sfDir))
      Files.writeString(Paths.get(s"$outDir/gates.json"), gates)
      // repo copy only at the driver's correctness scale — the thresholds
      // are operating points chosen (and spec-gated) at sf0.01; a dev run
      // at another scale must not overwrite the round's record
      val sfLabel = sfDir.split("/").filter(_.nonEmpty).lastOption.getOrElse("")
      val repoCopy = Paths.get(sys.props("user.dir"), "GATES.json")
      if (sfLabel == "sf0.01" && Files.isDirectory(repoCopy.getParent))
        Files.writeString(repoCopy, gates)
      println(s"""{"diag":"gates","gates":$gates}""")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] gates failed: ${e.getMessage}")
    }
    graft.operators.PlanCache.releaseAll(spark)
    spark.stop()
  }
}
