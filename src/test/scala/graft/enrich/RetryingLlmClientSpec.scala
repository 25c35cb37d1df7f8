package graft.enrich

import org.scalatest.funsuite.AnyFunSuite

import RetryingLlmClient.TransientServiceError

class RetryingLlmClientSpec extends AnyFunSuite {

  /** Fails `failures` times with a transient error, then succeeds. */
  private class Flaky(failures: Int) extends LlmClient {
    var calls = 0
    override def recognizeImage(p: String): Option[String] = {
      calls += 1
      if (calls <= failures) throw new TransientServiceError(s"429 on call $calls")
      Some(s"ok after $calls")
    }
    override def brandSamples(p: String): (Seq[String], Seq[String]) =
      (Seq(p), Seq(p))
    override def correctRow(row: Map[String, String]): Option[Map[String, String]] =
      Some(row)
  }

  test("retries transient failures with exponential backoff, then succeeds") {
    val flaky = new Flaky(failures = 3)
    val delays = scala.collection.mutable.ArrayBuffer[Long]()
    val client = new RetryingLlmClient(flaky, maxAttempts = 5,
      initialDelayMs = 2000, sleep = delays.append(_))
    assert(client.recognizeImage("img").contains("ok after 4"))
    assert(flaky.calls == 4)
    assert(delays.toSeq == Seq(2000L, 4000L, 8000L))  // reference policy: 2s ×2
  }

  test("gives up after maxAttempts and rethrows") {
    val flaky = new Flaky(failures = 99)
    val client = new RetryingLlmClient(flaky, maxAttempts = 5, sleep = _ => ())
    intercept[TransientServiceError](client.recognizeImage("img"))
    assert(flaky.calls == 5)
  }

  test("non-transient failures are not retried") {
    val client = new RetryingLlmClient(new LlmClient {
      var calls = 0
      override def recognizeImage(p: String): Option[String] = {
        calls += 1; throw new IllegalArgumentException("bad input")
      }
      override def brandSamples(p: String) = (Nil, Nil)
      override def correctRow(row: Map[String, String]) = Some(row)
    }, sleep = _ => ())
    intercept[IllegalArgumentException](client.recognizeImage("img"))
  }

  test("composes with ServiceEnrichment as a drop-in client") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val df = Seq((1L, "Nike", "")).toDF("id", "brand", "image")
    val out = ServiceEnrichment.process(df, "brand", "image",
      new RetryingLlmClient(new StubLlmClient, sleep = _ => ())).collect()
    assert(out(0).getAs[String](Enrichment.EnglishCol) == "NIKE, nike")
  }
}
