package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared session fixture: one local SparkSession per suite, UTC, AQE on —
  * the same config the engine ships (Engine.local), small core count to keep
  * specs quick.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  protected lazy val spark: SparkSession = Engine.local(4, getClass.getSimpleName)

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}
