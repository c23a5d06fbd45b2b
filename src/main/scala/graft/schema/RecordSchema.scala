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

  /** Per-row constraints derived from field declarations. */
  def fieldConstraints: Seq[RowConstraint] = fields.flatMap { f =>
    val req = if (f.required) Seq(Required(f.name)) else Nil
    val typed = f.ftype match {
      case EnumT(vs)       => Seq(EnumIn(f.name, vs))
      case it @ IntT(s) if s < 8 => Seq(IntWidth(f.name, it.lo, it.hi))
      case lt: ListT =>
        (lt.elemMin, lt.elemMax) match {
          case (Some(lo), Some(hi)) =>
            Seq(ArrayElemRange(f.name, lo, hi, lt.containsNull))
          case _ => Nil
        }
      case _ => Nil
    }
    val regex = f.regex.map(RegexMatch(f.name, _)).toSeq
    val range = (f.min, f.max) match {
      case (Some(lo), Some(hi)) => Seq(RangeBound(f.name, lo, hi))
      case _                    => Nil
    }
    req ++ typed ++ regex ++ range
  }

  def rowConstraints: Seq[RowConstraint] =
    fieldConstraints ++ tableConstraints.collect { case rc: RowConstraint => rc }

  def constraints: Seq[Constraint] = fieldConstraints ++ tableConstraints
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
