package graft.pg

import org.apache.spark.sql.Row
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression, Unevaluable}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, NullType}

/** `$n` bind-parameter placeholder: a resolved NullType leaf so that a
  * prepared statement analyzes before parameters arrive (mirrors the
  * reference's ParameterPlaceHolder,
  * catalyst/expressions/predicates.scala:26-34).
  */
case class ParameterPlaceHolder(id: Int) extends LeafExpression with Unevaluable {
  override lazy val resolved: Boolean = true
  override def dataType: DataType = NullType
  override def nullable: Boolean = true
  override def toString: String = s"$$$id"
}

/** PG clients (JDBC autocommit-off) send `BEGIN`; Spark has no transactions,
  * so it completes as an empty command (reference
  * service/postgresql/execution/command/commands.scala:30-32).
  */
case class PgBeginCommand() extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = Seq.empty
}
