package graft.export

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CSV export matching the reference's writer behavior
  * (neo4j_export.py:319-327): header row, missing values rendered as the
  * literal `NULL` (DictWriter restval), UTF-8.
  *
  * Two modes:
  *   - `singleFile = false` (default): a distributed write — one
  *     directory of part files per table. The only mode that makes sense
  *     at 100 TB; Data Importer-style consumers glob the directory.
  *   - `singleFile = true`: `coalesce(1)` then rename the part file to
  *     `<name>.csv` — byte-compatible with the reference's one-file-per-
  *     label layout for small exports.
  */
object CsvPackageWriter {

  /** RFC-4180 dialect shared by writer and readers: quotes inside quoted
    * values are escaped by DOUBLING the quote (escape = quote char), which
    * is what Python's csv module — the reference's writer AND the Data
    * Importer's parser — produces and expects. Spark's default escape of
    * backslash would serialize `say "hi"` as `"say \"hi\""`, which those
    * consumers misparse. */
  val CsvOptions: Map[String, String] = Map("header" -> "true", "escape" -> "\"")

  /** Render every column as string with NULL sentinel — the reference's
    * `restval='NULL'`. Public so the model generators sniff samples from
    * the SAME rendering the CSV contains (Row.get.toString differs, e.g.
    * java.sql.Timestamp appends ".0"). */
  def stringified(df: DataFrame): DataFrame = {
    val cols = df.columns.map(c => coalesce(col(c).cast("string"), lit("NULL")).as(c))
    df.select(cols.toSeq: _*)
  }

  def write(df: DataFrame, outputDir: String, name: String, singleFile: Boolean = false): Path = {
    // default emptyValue (quoted "") keeps empty strings distinguishable
    // from the NULL sentinel, so export -> import round-trips losslessly
    val out = stringified(df)
    if (singleFile) {
      val tmp = Paths.get(outputDir, s".__${name}_tmp")
      out.coalesce(1).write.mode("overwrite").options(CsvOptions).csv(tmp.toString)
      val listing = Files.list(tmp)
      val part = try {
        listing.filter(p => p.getFileName.toString.startsWith("part-")
          && p.getFileName.toString.endsWith(".csv")).findFirst().get()
      } finally listing.close()
      val target = Paths.get(outputDir, s"$name.csv")
      Files.createDirectories(target.getParent)
      Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
      // clean the temp dir (part metadata files)
      val walk = Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
      target
    } else {
      val target = Paths.get(outputDir, s"$name.csv")
      out.write.mode("overwrite").options(CsvOptions).csv(target.toString)
      target
    }
  }
}

/** Zip packaging of an export directory (neo4j_export.py:1246-1276):
  * all `*.csv` files + `neo4j_importer_model.json`. Single-file exports
  * zip flat like the reference; distributed exports have `<name>.csv/`
  * *directories* of part files, whose CSV parts are added under their
  * relative path so the package stays self-describing. */
object ZipPackager {
  def zipDirectory(dir: String, zipPath: String): Path = {
    val dirPath = Paths.get(dir)
    val out = Paths.get(zipPath)
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(out))
    // DEFLATED like the reference (neo4j_export.py:1264), at BEST_SPEED:
    // the packaging step is single-threaded by zip's nature, so the
    // compression level is the only knob that matters for export latency
    zos.setLevel(java.util.zip.Deflater.BEST_SPEED)

    def addFile(p: Path, entryName: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(entryName))
      Files.copy(p, zos)
      zos.closeEntry()
    }

    try {
      val top = Files.list(dirPath)
      try {
        top.sorted().forEach { p =>
          val n = p.getFileName.toString
          if (Files.isRegularFile(p) && (n.endsWith(".csv") || n == "neo4j_importer_model.json"))
            addFile(p, n)
          else if (Files.isDirectory(p) && n.endsWith(".csv")) {
            val parts = Files.list(p)
            try parts.sorted().filter(f => Files.isRegularFile(f)
              && f.getFileName.toString.endsWith(".csv"))
              .forEach(f => addFile(f, s"$n/${f.getFileName}"))
            finally parts.close()
          }
        }
      } finally top.close()
    } finally zos.close()
    out
  }
}
