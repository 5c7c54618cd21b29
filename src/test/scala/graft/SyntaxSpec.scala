package graft

import graft.config.ColumnMetadata
import graft.syntax._

class SyntaxSpec extends SparkTestBase {
  import spark.implicits._

  test("fluent pipeline: transforms → keep-latest → merge") {
    val raw = Seq(
      ("1", "  Ana ", "10"), ("1", "Ana v2", "20"), ("2", "None", "5")
    ).toDF("Id", "Nombre", "Ver")
    val cols = Seq(
      ColumnMetadata("Id", 1, "int", "fn_transform_Integer(Id)", isId = true),
      ColumnMetadata("Nombre", 2, "string", "fn_transform_ClearString(Nombre)"),
      ColumnMetadata("Ver", 3, "int", "fn_transform_Integer(Ver)", isOrderBy = true))

    val typed = raw.applyTransforms(cols).keepLatest(Seq("Id"), Seq("Ver"))
    val existing = Seq((2, "Bea", 1), (3, "Cara", 2)).toDF("Id", "Nombre", "Ver")
    val merged = typed.mergeInto(existing, Seq("Id")).orderBy("Id").collect()
    assert(merged.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    assert(merged(0).getString(1) === "Ana v2")
    assert(merged(1).isNullAt(1)) // 'None' from the new batch wins over Bea
  }

  test("fluent text ops: dedup, quality, lang id") {
    val docs = Seq(
      (1L, "the cat sat of the mat"),
      (2L, "THE CAT SAT OF THE MAT"),
      (3L, "el gato es un animal que vive en la casa")
    ).toDF("doc_id", "text")
    assert(docs.dedupExact("text", "doc_id").count() === 2)
    val quality = docs.withTextQuality("text").columns
    assert(quality.contains("n_tokens") && quality.contains("stopword_ratio"))
    val langs = docs.withLangId("doc_id", "text")
      .orderBy("doc_id").select("lang_pred").as[String].collect()
    assert(langs.toSeq === Seq("en", "en", "es"))
  }
}
