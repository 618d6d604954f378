package graft.lake

import org.apache.spark.sql.types._

/** Catalyst-level schema reconciler: diffs an incoming batch schema against
  * the table's current schema and produces the evolved schema, or rejects.
  *
  * Allowed evolutions (exactly the inverse of owid-etl's repack narrowing,
  * `lib/repack/owid/repack/__init__.py:86-124`, and the new/ghost-variable
  * handling of `etl/grapher_import.py:457-575`):
  *   - add column (becomes nullable),
  *   - widen integral types (byte→short→int→long),
  *   - widen float→double, integral→double/float,
  *   - widen decimal PRECISION at fixed scale (Iceberg's decimal rule:
  *     `decimal(P,S)` → `decimal(P',S)` for P' > P; scale changes move
  *     the digits and are rejected).
  * Missing columns in the batch are fine (null-filled at apply time).
  * Narrowing or incompatible type changes are rejected.
  */
object SchemaReconciler {

  private val widenRank: Map[DataType, Int] = Map(
    ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4,
    FloatType -> 11, DoubleType -> 12
  )

  /** Widest common type under our evolution rules, if any. */
  def widen(a: DataType, b: DataType): Option[DataType] = {
    if (a == b) return Some(a)
    (a, b) match {
      case (da: DecimalType, db: DecimalType) =>
        return if (da.scale == db.scale)
          Some(DecimalType(math.max(da.precision, db.precision), da.scale))
        else None
      case _ =>
    }
    (widenRank.get(a), widenRank.get(b)) match {
      case (Some(ra), Some(rb)) =>
        val intA = ra <= 4
        val intB = rb <= 4
        if (intA == intB) Some(if (ra >= rb) a else b) // same family → wider of the two
        else {
          // integral × fractional: float's 24-bit mantissa can't hold int/long,
          // so anything ≥ int paired with float promotes to double.
          val intRank = if (intA) ra else rb
          val frac = if (intA) b else a
          if (frac == DoubleType || intRank >= 3) Some(DoubleType) else Some(FloatType)
        }
      case _ => None
    }
  }

  final case class Result(schema: StructType, evolved: Boolean, changes: Seq[String])

  /** Reconcile `incoming` against `current`. Column order of `current` is
    * preserved; new columns append in `incoming` order.
    */
  def reconcile(current: StructType, incoming: StructType): Either[String, Result] = {
    val changes = scala.collection.mutable.ArrayBuffer.empty[String]
    val byName = incoming.fields.map(f => f.name -> f).toMap

    val evolvedExisting = current.fields.map { cf =>
      byName.get(cf.name) match {
        case None => cf // column absent from batch → kept, null-filled at apply
        case Some(inf) if inf.dataType == cf.dataType => cf
        case Some(inf) =>
          widen(cf.dataType, inf.dataType) match {
            case Some(w) if w == cf.dataType => cf // incoming narrower → cast up at apply
            case Some(w) =>
              changes += s"widen ${cf.name}: ${cf.dataType.simpleString} -> ${w.simpleString}"
              cf.copy(dataType = w)
            case None =>
              return Left(s"incompatible type change for column '${cf.name}': " +
                s"${cf.dataType.simpleString} vs ${inf.dataType.simpleString}")
          }
      }
    }
    val currentNames = current.fieldNames.toSet
    val added = incoming.fields.filterNot(f => currentNames.contains(f.name)).map { f =>
      changes += s"add ${f.name}: ${f.dataType.simpleString}"
      f.copy(nullable = true)
    }
    val out = StructType(evolvedExisting ++ added)
    Right(Result(out, changes.nonEmpty, changes.toSeq))
  }
}
