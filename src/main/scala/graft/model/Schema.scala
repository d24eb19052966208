package graft.model

import org.apache.spark.sql.types._

/** FieldSpec-style schema model (SURVEY §1.1; reference
  * `pinot-spi/.../data/Schema.java:62`, `FieldSpec.java:377-401` — fields
  * carry DIMENSION / METRIC / TIME / DATE_TIME roles and per-type default
  * null values).
  *
  * Spark has no dimension/metric distinction, so roles ride as StructField
  * metadata — consumed by NullHandling (role-dependent sentinel defaults)
  * and by ingestion validation; everything else sees a plain StructType. */
object Schema {
  sealed trait Role { def name: String }
  case object Dimension extends Role { val name = "DIMENSION" }
  case object Metric extends Role { val name = "METRIC" }
  case object Time extends Role { val name = "TIME" }
  case object DateTime extends Role { val name = "DATE_TIME" }

  final case class Field(name: String, dataType: DataType, role: Role,
                         singleValue: Boolean = true)

  private val RoleKey = "graft.role"

  /** Roles → StructField metadata; multi-value fields become arrays
    * (FieldSpec._isSingleValueField). */
  def toStructType(fields: Seq[Field]): StructType =
    StructType(fields.map { f =>
      val dt = if (f.singleValue) f.dataType else ArrayType(f.dataType)
      StructField(f.name, dt, nullable = true,
        new MetadataBuilder().putString(RoleKey, f.role.name).build())
    })

  def roleOf(sf: StructField): Option[String] =
    if (sf.metadata.contains(RoleKey)) Some(sf.metadata.getString(RoleKey))
    else None

  /** Metric-role column names — feeds NullHandling.sentinelFill. */
  def metricColumns(st: StructType): Set[String] =
    st.fields.collect {
      case f if roleOf(f).contains(Metric.name) => f.name
    }.toSet

  /** Validation: a df conforms when every declared field exists with a
    * compatible type (the reference rejects mismatched ingests). */
  def validate(st: StructType, df: org.apache.spark.sql.DataFrame)
  : Seq[String] =
    st.fields.toSeq.flatMap { f =>
      df.schema.fields.find(_.name == f.name) match {
        case None => Some(s"missing column: ${f.name}")
        case Some(actual) if actual.dataType != f.dataType =>
          Some(s"type mismatch ${f.name}: " +
            s"declared ${f.dataType.simpleString}, " +
            s"actual ${actual.dataType.simpleString}")
        case _ => None
      }
    }
}
