package graft.tools

import graft.export.GraphExporter
import graft.model.TpchGraph
import org.apache.spark.sql.SparkSession

/** CLI for the export pipeline, mirroring the reference's option surface
  * and configuration priority (neo4j_export.py:1336-1433): command-line
  * arguments > environment variables > env file > defaults. The Neo4j
  * connection options are replaced by the lakehouse input directory (this
  * engine reads tables, not Bolt).
  *
  * Usage:
  *   runMain graft.tools.ExportCli [-i INPUT] [-o OUTPUT] [-f {3.0,2.4.0,0.1.0}]
  *                                 [-z ZIP] [--no-zip] [--multi-part]
  *                                 [--env-file FILE]
  *
  * `--multi-part` switches the CSV writer to the distributed layout (a
  * `<name>.csv/` directory of part files per table) — the mode that holds
  * at scale; default stays the reference-compatible single file per
  * table.
  *
  * Env vars: GRAFT_INPUT_DIR, OUTPUT_DIR, FORMAT_VERSION (the reference's
  * names where they carry over).
  */
object ExportCli {

  final case class Config(
      input: String = "/root/testdata/sf0.001",
      output: String = "graft_export",
      format: String = "3.0",
      zipName: Option[String] = None,
      createZip: Boolean = true,
      singleFileCsv: Boolean = true)

  private def parseEnvFile(path: String): Map[String, String] =
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) Map.empty
    else {
      scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))).asScala
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
        .map { l => val Array(k, v) = l.split("=", 2); k.trim -> v.trim }
        .toMap
    }

  /** CLI > env var > env file > default — the reference's load_config. */
  def resolve(args: Array[String], env: Map[String, String] = sys.env): Config = {
    var cli = Map.empty[String, String]
    var noZip = false
    var multiPart = false
    var envFile = ".env"
    var i = 0
    def valueOf(flag: String): String = {
      if (i + 1 >= args.length)
        throw new IllegalArgumentException(s"option $flag requires a value")
      args(i + 1)
    }
    while (i < args.length) {
      args(i) match {
        case f @ ("-i" | "--input")  => cli += "input" -> valueOf(f); i += 2
        case f @ ("-o" | "--output") => cli += "output" -> valueOf(f); i += 2
        case f @ ("-f" | "--format") => cli += "format" -> valueOf(f); i += 2
        case f @ ("-z" | "--zip")    => cli += "zip" -> valueOf(f); i += 2
        case "--no-zip"              => noZip = true; i += 1
        case "--multi-part"          => multiPart = true; i += 1
        case f @ "--env-file"        => envFile = valueOf(f); i += 2
        case other => throw new IllegalArgumentException(s"unknown option $other")
      }
    }
    val fileCfg = parseEnvFile(envFile)
    def pick(cliKey: String, envKey: String, default: String): String =
      cli.getOrElse(cliKey, env.getOrElse(envKey, fileCfg.getOrElse(envKey, default)))
    val fmt = pick("format", "FORMAT_VERSION", "3.0")
    require(Set("3.0", "2.4.0", "0.1.0").contains(fmt), s"unsupported format $fmt")
    Config(
      input = pick("input", "GRAFT_INPUT_DIR", "/root/testdata/sf0.001"),
      output = pick("output", "OUTPUT_DIR", "graft_export"),
      format = fmt,
      zipName = cli.get("zip"),
      createZip = !noZip,
      singleFileCsv = !multiPart)
  }

  def main(args: Array[String]): Unit = {
    val cfg = resolve(args)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val result = GraphExporter.exportAll(
      TpchGraph.load(spark, cfg.input), cfg.output, cfg.format,
      singleFileCsv = cfg.singleFileCsv, createZip = cfg.createZip,
      zipName = cfg.zipName)
    println(s"[export] ${result.nodeFiles.size} node labels, ${result.relFiles.size} patterns -> ${cfg.output}")
    result.zipPath.foreach(z => println(s"[export] zip: $z"))
    spark.stop()
  }
}
