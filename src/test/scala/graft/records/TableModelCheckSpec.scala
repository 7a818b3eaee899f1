package graft.records

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.testkit.{SparkSpec, WireData}

/** MODEL CHECK of the table-format surface: a pseudo-random op sequence
  * (append / merge / deleteWhere) runs against both the RecordTable and a
  * plain in-memory Map reference model; after every op the table's
  * key→value state must equal the model exactly. Catches cross-op
  * interactions no single-op spec sees (merge over merged files, delete
  * of just-merged keys, name collisions across generations). */
class TableModelCheckSpec extends SparkSpec {

  private def rowsOf(base: Long, recs: Seq[(String, String)]) =
    WireData.recordRows(spark, base, recs)

  private def tableState(t: RecordTable): Map[String, String] =
    t.read(spark)
      .selectExpr("CAST(key_raw AS STRING) AS k", "CAST(value_raw AS STRING) AS v")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("random append/merge/delete sequences match the Map reference model") {
    // deterministic PRNG: reproducible failures
    val rnd = new scala.util.Random(42)
    val keys = ('a' to 'j').map(_.toString)

    (0 until 2).foreach { trial =>
      val dir = Files.createTempDirectory(s"graft-model-$trial").toString
      val table = new RecordTable(dir)
      var model = Map.empty[String, String]
      var nextOffset = 0L

      // seed: the model allows duplicate keys only via append — keep
      // appended key sets disjoint so the Map model is well-defined
      var appended = Set.empty[String]

      (0 until 8).foreach { step =>
        val op = rnd.nextInt(3)
        val stamp = s"$trial-$step"
        op match {
          case 0 => // append: fresh keys only (append does not dedup)
            val fresh = keys.filterNot(appended.contains).take(1 + rnd.nextInt(2))
            if (fresh.nonEmpty) {
              val recs = fresh.map(k => k -> s"a$stamp")
              table.appendSegment(spark, s"seg-$stamp", rowsOf(nextOffset, recs))
              nextOffset += 100
              appended ++= fresh
              model ++= recs
            }
          case 1 => // merge: any keys, existing or new
            val picked = rnd.shuffle(keys).take(1 + rnd.nextInt(3))
            val recs = picked.map(k => k -> s"m$stamp")
            table.merge(spark, rowsOf(nextOffset, recs),
              "CAST(key_raw AS STRING)", s"merge-$stamp")
            nextOffset += 100
            appended ++= picked
            model ++= recs
          case 2 => // deleteWhere on a random key subset
            val victims = rnd.shuffle(keys).take(1 + rnd.nextInt(2)).toSet
            val list = victims.map(v => s"'$v'").mkString(",")
            table.deleteWhere(spark, expr(s"CAST(key_raw AS STRING) IN ($list)"))
            appended --= victims
            model --= victims
        }
        val got = tableState(table)
        assert(got == model,
          s"trial $trial step $step (op $op): table $got != model $model")
      }
    }
  }
}
