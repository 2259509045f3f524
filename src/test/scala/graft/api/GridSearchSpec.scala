package graft.api

import graft.SparkTestSession.{sf, spark}
import graft.rules.Rules
import org.scalatest.funsuite.AnyFunSuite

class GridSearchSpec extends AnyFunSuite {

  test("grid search picks a schema-preserving argmax variant") {
    val variants = Seq(
      GridSearch.Variant("p1", Seq(Rules.SetParallelism(0, 1))),
      GridSearch.Variant("p4", Seq(Rules.SetParallelism(0, 4))))
    val (best, all) = GridSearch.search(spark, Flagship.graph, sf, variants,
      maxIterations = 1)
    assert(all.size == 2 && all.forall(_.schemaOk))
    assert(best.rate >= all.map(_.rate).max - 1e-9)
  }

  test("fake zero source matches an arbitrary schema (A23)") {
    val schema = graft.Tables.lineitem(spark, sf).schema
    val fake = FakeSource.zeros(spark, schema, 100)
    // element-spec equality = names + types (nullability tightens: a
    // constant source is never null)
    assert(fake.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(fake.count() == 100)
    val row = fake.head()
    assert(row.getDouble(schema.fieldIndex("l_quantity")) == 0.0)
    assert(row.getString(schema.fieldIndex("l_returnflag")) == "")
  }
}
