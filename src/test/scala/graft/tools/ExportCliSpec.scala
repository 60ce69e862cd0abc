package graft.tools

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class ExportCliSpec extends AnyFunSuite {

  test("config priority: CLI > env var > env file > default") {
    val envFile = Files.createTempFile("graft", ".env")
    Files.writeString(envFile, "OUTPUT_DIR=from_file\nFORMAT_VERSION=0.1.0\n")

    // file only
    val c1 = ExportCli.resolve(Array("--env-file", envFile.toString), env = Map.empty)
    assert(c1.output == "from_file" && c1.format == "0.1.0")

    // env var beats file
    val c2 = ExportCli.resolve(Array("--env-file", envFile.toString),
      env = Map("OUTPUT_DIR" -> "from_env"))
    assert(c2.output == "from_env" && c2.format == "0.1.0")

    // CLI beats both
    val c3 = ExportCli.resolve(
      Array("-o", "from_cli", "-f", "2.4.0", "--env-file", envFile.toString),
      env = Map("OUTPUT_DIR" -> "from_env"))
    assert(c3.output == "from_cli" && c3.format == "2.4.0")

    // defaults when nothing set
    val c4 = ExportCli.resolve(Array("--env-file", "/nonexistent"), env = Map.empty)
    assert(c4.output == "graft_export" && c4.format == "3.0" && c4.createZip)
  }

  test("zip flags") {
    val c = ExportCli.resolve(Array("-z", "my.zip", "--env-file", "/nonexistent"), env = Map.empty)
    assert(c.zipName.contains("my.zip"))
    val c2 = ExportCli.resolve(Array("--no-zip", "--env-file", "/nonexistent"), env = Map.empty)
    assert(!c2.createZip)
  }

  test("multi-part flag switches off single-file CSV") {
    val c = ExportCli.resolve(Array("--env-file", "/nonexistent"), env = Map.empty)
    assert(c.singleFileCsv) // reference-compatible default
    val c2 = ExportCli.resolve(Array("--multi-part", "--env-file", "/nonexistent"), env = Map.empty)
    assert(!c2.singleFileCsv)
  }

  test("unsupported format rejected") {
    intercept[IllegalArgumentException] {
      ExportCli.resolve(Array("-f", "9.9", "--env-file", "/nonexistent"), env = Map.empty)
    }
  }
}
