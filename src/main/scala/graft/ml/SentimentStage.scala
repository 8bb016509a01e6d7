package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel, Transformer}
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.functions.Sentiment

/** MLlib-Pipeline form of the sentiment scorer (SURVEY.md §2.4 E1 "MLlib
  * Pipeline variant for batch"): the same deterministic lexicon expression
  * wrapped as a `Transformer`, so it composes with feature stages
  * (`Tokenizer`, `HashingTF`, …) in a standard `Pipeline` and inherits
  * MLlib's persistence/parameter plumbing. The scoring math is exactly
  * [[graft.functions.Sentiment.score]] — one code path, no drift. */
class SentimentStage(override val uid: String) extends Transformer
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("sentiment"))

  final val inputCol: Param[String] =
    new Param(this, "inputCol", "text column to score")
  final val outputCol: Param[String] =
    new Param(this, "outputCol", "struct output column")
  setDefault(inputCol -> "text", outputCol -> "sentiment")

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)

  override def transform(ds: Dataset[_]): DataFrame =
    ds.withColumn($(outputCol), Sentiment.score(col($(inputCol))))

  override def transformSchema(schema: StructType): StructType = {
    require(schema($(inputCol)).dataType == StringType,
      s"${$(inputCol)} must be string, got ${schema($(inputCol)).dataType}")
    schema.add(StructField($(outputCol), StructType(Seq(
      StructField("label", StringType, nullable = true),
      StructField("positive", DoubleType, nullable = true),
      StructField("negative", DoubleType, nullable = true),
      StructField("neutral", DoubleType, nullable = true),
      StructField("mixed", DoubleType, nullable = true)))))
  }

  override def copy(extra: ParamMap): SentimentStage = defaultCopy(extra)
}

object SentimentStage extends DefaultParamsReadable[SentimentStage] {
  /** Ready-made single-stage pipeline: fit is a no-op (deterministic
    * lexicon — nothing to learn), included for API parity with trained
    * scorers a user might swap in. */
  def pipeline(textCol: String = "text"): Pipeline =
    new Pipeline().setStages(Array(
      new SentimentStage().setInputCol(textCol)))

  def fit(df: DataFrame, textCol: String = "text"): PipelineModel =
    pipeline(textCol).fit(df)
}
