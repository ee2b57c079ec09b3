package graft.analytics

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** f3's claim over the line formats: ORC keeps the columnar contract.
  * The round-trip hash gate proves losslessness; this pins the scan-side
  * properties that make ORC a resident-format option at 100 TB —
  * predicate pushdown and column pruning on the re-read data.
  */
class FormatSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("ORC re-read scan keeps predicate pushdown and column pruning") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val tmp = Files.createTempDirectory("graft-orc-spec").toString
    docs.write.mode("overwrite").orc(tmp)
    val plan = spark.read.orc(tmp)
      .filter("lang = 'en' AND n_chars > 100")
      .select("doc_id", "lang", "n_chars")
      .queryExecution.executedPlan.toString
    plan should include("PushedFilters: [IsNotNull(lang), IsNotNull(n_chars)")
    plan should include("EqualTo(lang,en)")
    plan should include regex "GreaterThan\\(n_chars,100"
    // text (the wide column) must not be read
    plan should include regex "ReadSchema: struct<doc_id:bigint,lang:string,n_chars:(bigint|int)"
    (plan should not).include("text:string")
  }

  test("f4 partitioned re-read prunes to the lang=en directory (PartitionFilters)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val tmp = Files.createTempDirectory("graft-part-spec").toString
    docs.write.mode("overwrite").partitionBy("lang").parquet(tmp)
    val plan = spark.read.parquet(tmp)
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
      .queryExecution.executedPlan.toString
    // the predicate must resolve at PLANNING time against directory
    // values — a partition filter, not a pushed data filter
    plan should include regex "PartitionFilters: \\[isnotnull\\(lang.*\\), \\(lang.* = en\\)\\]"
    (plan should not).include("EqualTo(lang,en)")
  }
}
