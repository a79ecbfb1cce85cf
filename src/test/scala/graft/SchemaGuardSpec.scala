package graft

import graft.sources.Tables

/** Loud schema-drift detector. The driver regenerates the testdata between
  * rounds and has already changed the `ts` parquet encoding three times —
  * the NTZ flip broke an operator SILENTLY for two rounds. This spec pins
  * the post-catalog-normalization schema of every table (names + Spark
  * types as FIXTURES.md §B documents them), so the NEXT regeneration that
  * drifts a type or renames a column fails here with a message naming the
  * table — one glance instead of a two-round hunt. If this fails after a
  * regeneration: update FIXTURES.md §B, extend the catalog normalization
  * (Tables.scala) if the drift is an encoding artifact, and only then
  * touch operators.
  */
class SchemaGuardSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "integer", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "integer", "n_name" -> "string",
      "n_regionkey" -> "integer"),
    "customer" -> Seq("c_custkey" -> "long", "c_name" -> "string",
      "c_nationkey" -> "integer", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "long", "s_name" -> "string",
      "s_nationkey" -> "integer", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "long", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "integer",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "long", "o_custkey" -> "long",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "long", "l_partkey" -> "long",
      "l_suppkey" -> "long", "l_linenumber" -> "integer",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"),
    "events" -> Seq("event_id" -> "long", "ts" -> "timestamp",
      "user_id" -> "long", "event_type" -> "string", "value" -> "double",
      "props" -> "string"),
    "documents" -> Seq("doc_id" -> "long", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "long"),
    "embeddings" -> Seq("vec_id" -> "long", "embedding" -> "array",
      "label" -> "integer"))

  test("every catalog table matches the FIXTURES.md schema after normalization") {
    val drift = Tables.all.flatMap { t =>
      // events goes through its dedicated accessor (nanos-Long rebuild)
      val df = if (t == "events") Tables.events(spark, sf)
               else Tables(spark, sf, t)
      val got = df.schema.fields.map(f => f.name -> f.dataType.typeName).toSeq
      expected.get(t) match {
        case None => Some(s"$t: table exists in Tables.all but has no " +
          "expected schema here — add it to SchemaGuardSpec and FIXTURES.md")
        case Some(want) if got == want => None
        case Some(want) => Some(s"$t:\n  got  $got\n  want $want")
      }
    }
    assert(drift.isEmpty,
      "testdata schema drifted — see SchemaGuardSpec scaladoc for the " +
        s"recovery order:\n${drift.mkString("\n")}")
  }

  test("embedding element type is float or double (operators cast explicitly)") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val dt = Tables.embeddings(spark, sf).schema("embedding").dataType
    dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => ()
      case other => fail(s"embedding is $other — every vector op casts " +
        "array<double> and assumes a numeric array element")
    }
  }
}
