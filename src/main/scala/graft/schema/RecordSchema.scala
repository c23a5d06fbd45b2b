package graft.schema

import org.apache.spark.sql.types._
import graft.constraint._

/** Declarative record schema — the engine's analogue of a pyschema `Record`
  * subclass (pyschema/core.py :: Record + PySchema metaclass, SURVEY §1.1).
  * Declaration order is preserved (R2): `fields` order = struct order.
  *
  * `fieldConstraints` derives the per-row constraint set from the field
  * specs exactly the way the reference derives accept/reject behavior from
  * Field subclasses (R12–R15): required ⇒ non-null, EnumT ⇒ membership,
  * IntT(size<8) ⇒ width range, ListT bounds ⇒ element range, regex/min/max
  * knobs ⇒ their predicates. `tableConstraints` adds cross-row checks
  * (Unique / RefIntegrity / Drift / ArraySizeEquals).
  */
final case class RecordSchema(
    name: String,
    fields: Seq[FieldSpec],
    tableConstraints: Seq[Constraint] = Nil,
    autoRegister: Boolean = true
) {
  if (autoRegister) SchemaRegistry.register(this)

  def structType: StructType = StructType(fields.map(_.structField))

  def fieldNames: Seq[String] = fields.map(_.name)

  def field(n: String): FieldSpec =
    fields.find(_.name == n).getOrElse(sys.error(s"no field $n in $name"))

  /** Per-row constraints derived from field declarations. SubRecord fields
    * recurse: nested constraints address the column with the dotted struct
    * path (`parent.child`), so a nested violation carries the dotted id —
    * the reference's nested-dict propagation (FIXTURES.md §3 "SubRecord").
    */
  def fieldConstraints: Seq[RowConstraint] =
    RecordSchema.constraintsFor(fields, prefix = "")

  def rowConstraints: Seq[RowConstraint] =
    fieldConstraints ++ tableConstraints.collect { case rc: RowConstraint => rc }

  def constraints: Seq[Constraint] = fieldConstraints ++ tableConstraints
}

object RecordSchema {
  /** Derive row constraints for a field list; `prefix` is the dotted struct
    * path for nested records ("" at the top level).
    */
  private[schema] def constraintsFor(fields: Seq[FieldSpec], prefix: String): Seq[RowConstraint] =
    fields.flatMap { f =>
      val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      val req = if (f.required) Seq(Required(path)) else Nil
      val typed = f.ftype match {
        case EnumT(vs)             => Seq(EnumIn(path, vs))
        case it @ IntT(s) if s < 8 => Seq(IntWidth(path, it.lo, it.hi))
        case lt: ListT =>
          (lt.elemMin, lt.elemMax) match {
            case (Some(lo), Some(hi)) =>
              // fast codegen'd path only for array<int> (4-byte stride);
              // wider/narrower elements take the general HOF path
              Seq(ArrayElemRange(path, lo, hi, lt.containsNull,
                int32Elem = lt.elem.dataType == IntegerType))
            case _ => Nil
          }
        case mt: MapT =>
          (mt.valueMin, mt.valueMax) match {
            case (Some(lo), Some(hi)) => Seq(MapValueRange(path, lo, hi))
            case _                    => Nil
          }
        case SubRecordT(sub) =>
          // nested checks apply only when the sub-record is present — a
          // NULL sub-record is the PARENT's required-ness to flag, exactly
          // once (reference: SubRecord.dump(None) on an optional field is
          // accepted without descending)
          constraintsFor(sub.fields, path).map(NestedGuard(path, _))
        case _               => Nil
      }
      val regex = f.regex.map(RegexMatch(path, _)).toSeq
      val range = (f.min, f.max) match {
        case (Some(lo), Some(hi)) => Seq(RangeBound(path, lo, hi))
        case _                    => Nil
      }
      val bytes = f.maxBytes.map(BytesMaxLen(path, _)).toSeq
      req ++ typed ++ regex ++ range ++ bytes
    }
}

/** Global name → schema registry (pyschema/core.py :: SchemaStore /
  * auto_store, SURVEY §2.1 R3–R4). Registration happens at construction
  * unless `autoRegister = false` (the reference's `no_auto_store`).
  * Used by [[graft.json.JsonCodec]] to dispatch on the serialized
  * `$record_name` discriminator.
  */
object SchemaRegistry {
  private val store = new java.util.concurrent.ConcurrentHashMap[String, RecordSchema]()

  def register(s: RecordSchema): RecordSchema = { store.put(s.name, s); s }
  def lookup(name: String): Option[RecordSchema] = Option(store.get(name))
  def contains(name: String): Boolean = store.containsKey(name)
  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    store.keySet().asScala.toSeq.sorted
  }
  def clear(): Unit = store.clear()
}
