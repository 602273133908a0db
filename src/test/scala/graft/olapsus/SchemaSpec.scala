package graft.olapsus

import graft.SparkSpecBase
import org.apache.spark.sql.types.StructType

/** Generators and ETL outputs must conform to the declared warehouse DDL
  * (Schemas ≙ scripts/init.sql). Nullability is not part of the
  * contract (parquet round-trips relax it), so names+types compare. */
class SchemaSpec extends SparkSpecBase {

  private def shape(s: StructType): Seq[(String, String)] =
    s.fields.map(f => (f.name.toLowerCase, f.dataType.simpleString)).toSeq

  test("generated dimensions match the declared DDL") {
    assert(shape(Dims.dimData(spark).schema) == shape(Schemas.dimData))
    assert(shape(Dims.dimHorario(spark).schema) == shape(Schemas.dimHorario))
    assert(shape(Dims.dimDemografia(spark).schema) == shape(Schemas.dimDemografia))
    assert(shape(Dims.dimInfoNascimento(spark).schema) == shape(Schemas.dimInfoNascimento))
    assert(shape(Dims.bridgeSeed(spark).schema) == shape(Schemas.ponteGrupoCausas))
  }

  test("factInternacoes stays declared (reference never populates it)") {
    assert(Schemas.all.contains("factInternacoes"))
    assert(Schemas.factInternacoes.fieldNames.contains("valor"))
  }
}
