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

/** LISTEN <channel>: register this wire session on the channel. Outside a
  * wire session (library use) it is a no-op, like PG's own behavior when no
  * backend exists to deliver to.
  */
case class PgListenCommand(channel: String) extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    graft.pg.server.PgNotify.pidOf(sparkSession)
      .foreach(pid => graft.pg.server.PgNotify.listen(pid, channel))
    Seq.empty
  }
}

/** UNLISTEN <channel> / UNLISTEN * (channel = None). */
case class PgUnlistenCommand(channel: Option[String]) extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    graft.pg.server.PgNotify.pidOf(sparkSession)
      .foreach(pid => graft.pg.server.PgNotify.unlisten(pid, channel))
    Seq.empty
  }
}

/** NOTIFY <channel> [, 'payload']: deliver a NotificationResponse to every
  * session listening on the channel (including the sender, per PG).
  */
case class PgNotifyCommand(channel: String, payload: String)
  extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val sender = graft.pg.server.PgNotify.pidOf(sparkSession).getOrElse(0)
    graft.pg.server.PgNotify.notify(sender, channel, payload)
    Seq.empty
  }
}
