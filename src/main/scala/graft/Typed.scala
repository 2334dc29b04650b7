package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed Dataset facade over the star schema — case-class Encoders where
  * compile-time safety helps (ETL glue, tests, library consumers), while
  * the query operators stay DataFrame-first so Catalyst sees through every
  * expression (typed `map`/`filter` lambdas are opaque to the optimizer;
  * these accessors only bind SCHEMA, they never smuggle logic into
  * closures).
  */
object Typed {

  case class LineItem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Long, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double, l_returnflag: String,
      l_linestatus: String, l_shipdate: Timestamp)

  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)

  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Long,
      c_acctbal: Double, c_mktsegment: String)

  case class Document(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)

  case class Embedding(vec_id: Long, embedding: Array[Float], label: Long)

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  def lineitem(spark: SparkSession, dir: String): Dataset[LineItem] = {
    import spark.implicits._
    Tables.lineitem(spark, dir).as[LineItem]
  }

  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
      .as[Order]
  }

  def customer(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
      .as[Customer]
  }

  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.documents(spark, dir).as[Document]
  }

  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables.embeddings(spark, dir).as[Embedding]
  }

  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event]
  }
}
