package graft.sources

import java.nio.file.Files
import graft.SparkTestBase
import org.apache.spark.sql.types._

class CsvSourceSpec extends SparkTestBase {

  test("sample-based type sniffing: integer/float/boolean/string + NULL sentinel") {
    val dir = Files.createTempDirectory("graft-csv")
    Files.writeString(dir.resolve("t.csv"),
      "id,price,flag,name,maybe\n1,9.5,true,alice,NULL\n2,8.25,false,bob,x\n")
    val df = CsvSource.readTyped(spark, dir.resolve("t.csv").toString)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("id") == LongType)
    assert(types("price") == DoubleType)
    assert(types("flag") == BooleanType)
    assert(types("name") == StringType)
    assert(types("maybe") == StringType) // sample was NULL → string
    val rows = df.orderBy("id").collect()
    assert(rows(0).getLong(0) == 1L && rows(0).getDouble(1) == 9.5 && rows(0).getBoolean(2))
    assert(rows(0).isNullAt(4)) // NULL sentinel became a real null
    assert(rows(1).getString(4) == "x")
  }
}
