package graft.schema

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.StructType

/** Static case-class schemas imposed on readers — never inferred
  * (reference BehaviorSchema.scala:3–14, SessionSchema.scala:3–15;
  * SURVEY.md §1.2).
  */
case class Behavior(
    event_time: String,
    event_type: String,
    product_id: Long,
    category_id: Long,
    category_code: String,
    brand: String,
    price: Double,
    user_id: Long,
    event_date: String,
    event_hour: String)

/** Behavior + nullable session_id (position 8, SessionSchema.scala:12).
  * session_id stays nullable in-schema even though job output guarantees
  * non-null — unionByName(allowMissingColumns) null-widens through it
  * (SURVEY.md §7.5).
  */
case class SessionRow(
    event_time: String,
    event_type: String,
    product_id: Long,
    category_id: Long,
    category_code: String,
    brand: String,
    price: Double,
    user_id: Long,
    session_id: String,
    event_date: String,
    event_hour: String)

object Schemas {
  val behavior: StructType = Encoders.product[Behavior].schema
  val session: StructType = Encoders.product[SessionRow].schema
  /** `"yyyy-MM-dd HH:mm:ss 'UTC'"` — the literal-UTC parse format
    * (SessionizationBuiltIn.scala:82–85; 'UTC' matches text, not a zone;
    * session timezone must be pinned to UTC).
    */
  val EventTimeFormat = "yyyy-MM-dd HH:mm:ss 'UTC'"
}
