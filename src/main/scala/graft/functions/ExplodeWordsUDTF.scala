package graft.functions

import org.apache.hadoop.hive.ql.exec.UDFArgumentException
import org.apache.hadoop.hive.ql.udf.generic.GenericUDTF
import org.apache.hadoop.hive.serde2.objectinspector._
import org.apache.hadoop.hive.serde2.objectinspector.primitive.PrimitiveObjectInspectorFactory

/** A Hive GenericUDTF (word exploder), registrable through
  * `CREATE TEMPORARY FUNCTION ... AS '...'` on a Hive-enabled session —
  * the reference exercises exactly this path with its TestUDTF.jar
  * (SparkSqlParser.scala:237-261, PgJdbcSuite.scala:1283-1329).
  */
class ExplodeWordsUDTF extends GenericUDTF {

  private var inspector: PrimitiveObjectInspector = _

  override def initialize(args: Array[ObjectInspector]): StructObjectInspector = {
    if (args.length != 1) throw new UDFArgumentException("explode_words takes one argument")
    inspector = args(0).asInstanceOf[PrimitiveObjectInspector]
    ObjectInspectorFactory.getStandardStructObjectInspector(
      java.util.Arrays.asList("word"),
      java.util.Arrays.asList(
        PrimitiveObjectInspectorFactory.javaStringObjectInspector: ObjectInspector))
  }

  override def process(args: Array[AnyRef]): Unit = {
    val s = String.valueOf(inspector.getPrimitiveJavaObject(args(0)))
    s.split("\\s+").filter(_.nonEmpty).foreach(w => forward(Array[AnyRef](w)))
  }

  override def close(): Unit = ()
}
