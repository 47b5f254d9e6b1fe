package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** Registers an expression builder as a temp SQL function on a LIVE
  * session. The blessed route is `spark.sql.extensions=graft.GraftExtensions`
  * (applied at session build time); this bridge covers sessions the library
  * did not create — e.g. a host application handing graft an existing
  * SparkSession — where extension config can no longer be applied.
  * `sessionState` is `private[sql]`, hence this file's package.
  */
object FunctionBridge {
  def registerTemp(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[ClassicSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
