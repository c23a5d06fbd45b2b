package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.schema._
import graft.schema.SchemaCompat.Finding

/** Schema-evolution compatibility (reader-side / backward rules). */
class SchemaCompatSpec extends AnyFunSuite {

  private def rec(name: String, fs: FieldSpec*) =
    RecordSchema(name, fs, autoRegister = false)

  private val base = rec("V1",
    FieldSpec("doc_id", TextT, required = true, regex = Some("^doc-[0-9]+$")),
    FieldSpec("n_tok", IntT(4), required = true, min = Some(1L), max = Some(8192L)),
    FieldSpec("lang", EnumT(Seq("de", "en"))),
    FieldSpec("tokens", ListT(IntT(4), elemMin = Some(0L), elemMax = Some(100L))))

  test("identical schemas: no findings, compatible") {
    assert(SchemaCompat.check(base, base).isEmpty)
    assert(SchemaCompat.compatible(base, base))
  }

  test("added fields: optional/defaulted ok, required-without-default breaks") {
    val withOpt = rec("V2", base.fields :+ FieldSpec("score", FloatT(8)): _*)
    assert(SchemaCompat.compatible(withOpt, base))
    val withDef = rec("V2", base.fields :+
      FieldSpec("src", TextT, required = true, default = Some("web")): _*)
    assert(SchemaCompat.compatible(withDef, base))
    val withReq = rec("V2", base.fields :+ FieldSpec("src", TextT, required = true): _*)
    val f = SchemaCompat.check(withReq, base)
    assert(f == Seq(Finding("src", "added", false,
      "required without default — every old row fails required")))
  }

  test("removed field is reader-compatible") {
    val dropped = rec("V2", base.fields.filterNot(_.name == "lang"): _*)
    val f = SchemaCompat.check(dropped, base)
    assert(f == Seq(Finding("lang", "removed", true, "reader ignores the written column")))
  }

  test("numeric promotions widen, narrowings break") {
    val wide = rec("V2", base.fields.map {
      case f if f.name == "n_tok" => f.copy(ftype = IntT(8))
      case f => f
    }: _*)
    assert(SchemaCompat.check(wide, base).exists(f =>
      f.change == "int_widened" && f.compatible))
    val narrow = rec("V2", base.fields.map {
      case f if f.name == "n_tok" => f.copy(ftype = IntT(2))
      case f => f
    }: _*)
    assert(SchemaCompat.check(narrow, base).exists(f =>
      f.change == "int_narrowed" && !f.compatible))
    val float = rec("V2", base.fields.map {
      case f if f.name == "n_tok" => f.copy(ftype = FloatT(8))
      case f => f
    }: _*)
    assert(SchemaCompat.check(float, base).exists(f =>
      f.change == "int_to_float" && f.compatible))
  }

  test("enum evolution: superset ok, dropped symbol breaks, widening to text ok") {
    def withLang(t: FType) = rec("V2", base.fields.map {
      case f if f.name == "lang" => f.copy(ftype = t)
      case f => f
    }: _*)
    assert(SchemaCompat.compatible(withLang(EnumT(Seq("de", "en", "fr"))), base))
    val narrowed = SchemaCompat.check(withLang(EnumT(Seq("en"))), base)
    assert(narrowed.exists(f => f.change == "enum_narrowed" && !f.compatible &&
      f.detail.contains("de")))
    assert(SchemaCompat.compatible(withLang(TextT), base))
    assert(!SchemaCompat.compatible(base, withLang(TextT)),
      "text -> enum cannot be proven safe")
  }

  test("constraint tightening is surfaced as incompatible for a validator") {
    val tighter = rec("V2", base.fields.map {
      case f if f.name == "n_tok" => f.copy(max = Some(4096L))
      case f => f
    }: _*)
    assert(SchemaCompat.check(tighter, base).exists(f =>
      f.change == "range_tightened" && !f.compatible))
    val looser = rec("V2", base.fields.map {
      case f if f.name == "n_tok" => f.copy(max = Some(16384L))
      case f => f
    }: _*)
    assert(SchemaCompat.compatible(looser, base))
    val regexChange = rec("V2", base.fields.map {
      case f if f.name == "doc_id" => f.copy(regex = Some("^doc-[0-9]{12}$"))
      case f => f
    }: _*)
    assert(SchemaCompat.check(regexChange, base).exists(f =>
      f.change == "regex_changed" && !f.compatible))
  }

  test("array element rules: forbidden nulls and tightened bounds break") {
    def withTokens(t: ListT) = rec("V2", base.fields.map {
      case f if f.name == "tokens" => f.copy(ftype = t)
      case f => f
    }: _*)
    val oldNullable = rec("V1n", base.fields.map {
      case f if f.name == "tokens" =>
        f.copy(ftype = ListT(IntT(4), containsNull = true,
          elemMin = Some(0L), elemMax = Some(100L)))
      case f => f
    }: _*)
    assert(SchemaCompat.check(base, oldNullable).exists(f =>
      f.change == "elem_nulls_forbidden" && !f.compatible))
    val tighter = withTokens(ListT(IntT(4), elemMin = Some(0L), elemMax = Some(50L)))
    assert(SchemaCompat.check(tighter, base).exists(f =>
      f.change == "elem_range_tightened" && !f.compatible))
    val widerElem = withTokens(ListT(IntT(8), elemMin = Some(0L), elemMax = Some(100L)))
    assert(SchemaCompat.check(widerElem, base).exists(f =>
      f.field == "tokens[]" && f.change == "int_widened" && f.compatible))
  }

  test("nested records recurse with dotted paths") {
    val metaV1 = rec("MetaV1", FieldSpec("origin", TextT, required = true))
    val metaV2 = rec("MetaV2",
      FieldSpec("origin", TextT, required = true),
      FieldSpec("rating", IntT(4), required = true))
    val v1 = rec("D1", FieldSpec("meta", SubRecordT(metaV1)))
    val v2 = rec("D2", FieldSpec("meta", SubRecordT(metaV2)))
    val f = SchemaCompat.check(v2, v1)
    assert(f == Seq(Finding("meta.rating", "added", false,
      "required without default — every old row fails required")))
  }

  test("unrelated type change has no resolution rule") {
    val changed = rec("V2", base.fields.map {
      case f if f.name == "doc_id" => f.copy(ftype = IntT(8), regex = None)
      case f => f
    }: _*)
    assert(SchemaCompat.check(changed, base).exists(f =>
      f.change == "type_changed" && !f.compatible))
  }

  test("forward: loosened range breaks old readers, tightened is fine") {
    // widen n_tok's max — backward-compatible (old rows still fit), but
    // FORWARD-incompatible: new writers can emit n_tok=20000, which the
    // old schema's validator rejects
    val wider = rec("V2", base.fields.map {
      case f if f.name == "n_tok" => f.copy(max = Some(20000L))
      case f => f
    }: _*)
    assert(SchemaCompat.compatible(wider, base))
    assert(!SchemaCompat.forwardCompatible(wider, base))
    assert(SchemaCompat.forward(wider, base).exists(f =>
      f.field == "n_tok" && f.change == "range_tightened" && !f.compatible))
    // the mirror: tightening is forward-compatible, backward-incompatible
    val tighter = rec("V2", base.fields.map {
      case f if f.name == "n_tok" => f.copy(max = Some(100L))
      case f => f
    }: _*)
    assert(!SchemaCompat.compatible(tighter, base))
    assert(SchemaCompat.forwardCompatible(tighter, base))
  }

  test("forward: removed field needs an old-side default; added optional field is fine") {
    // drop an optional field — new writers stop writing `lang`; the OLD
    // reader treats it as missing, and since it's optional there, fine
    val dropped = rec("V2", base.fields.filterNot(_.name == "lang"): _*)
    assert(SchemaCompat.forwardCompatible(dropped, base))
    assert(SchemaCompat.forward(dropped, base).exists(f =>
      f.field == "lang" && f.change == "added" && f.compatible))
    // drop a REQUIRED-without-default field — old readers break
    val droppedReq = rec("V2", base.fields.filterNot(_.name == "n_tok"): _*)
    assert(!SchemaCompat.forwardCompatible(droppedReq, base))
    // add an optional field in new — old readers just ignore the column
    val added = rec("V2", base.fields :+ FieldSpec("extra", TextT): _*)
    assert(SchemaCompat.forwardCompatible(added, base))
    assert(SchemaCompat.forward(added, base).exists(f =>
      f.field == "extra" && f.change == "removed" && f.compatible))
  }

  test("full mode is the conjunction, tagged by direction") {
    // enum extension: backward ok (supersets load), forward NOT (new
    // writers emit the new symbol, old validators reject it)
    val extended = rec("V2", base.fields.map {
      case f if f.name == "lang" => f.copy(ftype = EnumT(Seq("de", "en", "fr")))
      case f => f
    }: _*)
    assert(SchemaCompat.compatible(extended, base))
    assert(!SchemaCompat.fullCompatible(extended, base))
    val byDir = SchemaCompat.full(extended, base).groupBy(_._1)
    assert(byDir("backward").forall(_._2.compatible))
    assert(byDir("forward").exists(f =>
      f._2.change == "enum_narrowed" && !f._2.compatible))
    // identical schemas are FULL-compatible with zero findings
    assert(SchemaCompat.full(base, base).isEmpty)
    assert(SchemaCompat.fullCompatible(base, base))
  }
}
