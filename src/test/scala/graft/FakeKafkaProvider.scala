package graft.testkit

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.streaming.Source
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types._

/** Test-scope stand-in for the spark-sql-kafka connector (absent in this
  * container). Registered under the REAL short name `kafka` via
  * `META-INF/services/org.apache.spark.sql.sources.DataSourceRegister`, so
  * `readStream.format("kafka")…load()` resolves through Spark's actual
  * source-resolution machinery and hands this provider the exact options
  * map the reader assembled — which is the contract under test
  * (`StreamingSpec`: startingOffsets / maxOffsetsPerTrigger / kafka.*
  * props reach the source). Only the live consume loop stays waived. */
class FakeKafkaProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "kafka"

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
  : (String, StructType) = {
    FakeKafkaProvider.lastOptions = parameters
    ("fake-kafka", FakeKafkaProvider.kafkaSchema)
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    FakeKafkaProvider.lastOptions = parameters
    throw new UnsupportedOperationException(
      "fake kafka provider resolves schema/options only; no consume loop")
  }
}

object FakeKafkaProvider {
  /** The options map Spark handed the provider on the last resolution —
    * keys are lowercased by Spark's CaseInsensitiveMap. */
  @volatile var lastOptions: Map[String, String] = Map.empty

  /** The connector's public row schema (Spark Kafka source docs). */
  val kafkaSchema: StructType = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType),
    StructField("topic", StringType), StructField("partition", IntegerType),
    StructField("offset", LongType), StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))
}
