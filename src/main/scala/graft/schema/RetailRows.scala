package graft.schema

import java.sql.Date

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

import graft.sources.CsvTableReader

/** Typed facade over the five retail tables (SURVEY §1.2): case
  * classes mirroring the Snowflake DDL with the reference-runtime
  * types (money as Double — see [[RetailSchemas]]). The untyped
  * DataFrame surface stays the default (the reference is entirely
  * column-name based); these exist for consumers who want compile-time
  * field checking, and each loader is schema-checked against
  * [[RetailSchemas]] at construction.
  */
object RetailRows {

  final case class SalesRow(
      trans_id: Option[Int], prod_key: Option[Int], store_key: Option[Int],
      trans_dt: Option[Date], trans_time: Option[Int],
      sales_qty: Option[Double], sales_price: Option[Double],
      sales_amt: Option[Double], discount: Option[Double],
      sales_cost: Option[Double], sales_mgrn: Option[Double],
      ship_cost: Option[Double])

  final case class InventoryRow(
      cal_dt: Option[Date], store_key: Option[Int], prod_key: Option[Int],
      inventory_on_hand_qty: Option[Double], inventory_on_order_qty: Option[Double],
      out_of_stock_flg: Option[Int], waste_qty: Option[Double],
      promotion_flg: Option[Boolean], next_delivery_dt: Option[Date])

  final case class CalendarRow(
      // Option even though the DDL says NOT NULL: file sources force
      // user schemas nullable, so a null date would otherwise crash the
      // decoder mid-task instead of surfacing as data
      cal_dt: Option[Date], cal_type_desc: Option[String], day_of_wk_num: Option[String],
      day_of_wk_desc: Option[String], yr_num: Option[Int], wk_num: Option[Int],
      yr_wk_num: Option[Int], mnth_num: Option[Int], yr_mnth_num: Option[Int],
      qtr_num: Option[Int], yr_qtr_num: Option[Int])

  final case class StoreRow(
      store_key: Option[Int], store_num: Option[String], store_desc: Option[String],
      addr: Option[String], city: Option[String], region: Option[String],
      cntry_cd: Option[String], cntry_nm: Option[String],
      postal_zip_cd: Option[String], prov_state_desc: Option[String],
      prov_state_cd: Option[String], store_type_cd: Option[String],
      store_type_desc: Option[String], frnchs_flg: Option[Boolean],
      store_size: Option[java.math.BigDecimal], market_key: Option[Int],
      market_name: Option[String], submarket_key: Option[Int],
      submarket_name: Option[String], latitude: Option[java.math.BigDecimal],
      longitude: Option[java.math.BigDecimal])

  final case class ProductRow(
      prod_key: Option[Int], prod_name: Option[String], vol: Option[Double],
      wgt: Option[Double], brand_name: Option[String], status_code: Option[Int],
      status_code_name: Option[String], category_key: Option[Int],
      category_name: Option[String], subcategory_key: Option[Int],
      subcategory_name: Option[String])

  implicit val salesEnc: Encoder[SalesRow] = Encoders.product[SalesRow]
  implicit val inventoryEnc: Encoder[InventoryRow] = Encoders.product[InventoryRow]
  implicit val calendarEnc: Encoder[CalendarRow] = Encoders.product[CalendarRow]
  implicit val storeEnc: Encoder[StoreRow] = Encoders.product[StoreRow]
  implicit val productEnc: Encoder[ProductRow] = Encoders.product[ProductRow]

  def sales(spark: SparkSession, path: String): Dataset[SalesRow] =
    CsvTableReader.readRetail(spark, "sales", path).as[SalesRow]
  def inventory(spark: SparkSession, path: String): Dataset[InventoryRow] =
    CsvTableReader.readRetail(spark, "inventory", path).as[InventoryRow]
  def calendar(spark: SparkSession, path: String): Dataset[CalendarRow] =
    CsvTableReader.readRetail(spark, "calendar", path).as[CalendarRow]
  def store(spark: SparkSession, path: String): Dataset[StoreRow] =
    CsvTableReader.readRetail(spark, "store", path).as[StoreRow]
  def product(spark: SparkSession, path: String): Dataset[ProductRow] =
    CsvTableReader.readRetail(spark, "product", path).as[ProductRow]
}
