package graft.enrich

import scala.annotation.tailrec

/** Retry/backoff decorator for [[LlmClient]], mirroring the reference's
  * policy (utils/gpt.py:78-79,104-143): up to `maxAttempts` tries, delay
  * starting at `initialDelayMs` and doubling each retry, retrying only on
  * failures the predicate classifies as transient (the reference retries
  * 429 rate limits and 401s after key rotation).
  *
  * The sleeper is injectable so specs can run without wall-clock waits;
  * executors instantiate one client per partition, so retry state is
  * task-local (no coordination needed).
  */
class RetryingLlmClient(
    inner: LlmClient,
    maxAttempts: Int = 5,
    initialDelayMs: Long = 2000,
    backoffFactor: Double = 2.0,
    isTransient: Throwable => Boolean = RetryingLlmClient.defaultTransient,
    sleep: Long => Unit = Thread.sleep) extends LlmClient {

  require(maxAttempts >= 1)

  private def withRetry[A](op: => A): A = {
    @tailrec def attempt(n: Int, delayMs: Long): A = {
      val r =
        try Right(op)
        catch {
          case t: Throwable if isTransient(t) && n < maxAttempts => Left(t)
        }
      r match {
        case Right(a) => a
        case Left(_) =>
          sleep(delayMs)
          attempt(n + 1, (delayMs * backoffFactor).toLong)
      }
    }
    attempt(1, initialDelayMs)
  }

  override def recognizeImage(imagePayload: String): Option[String] =
    withRetry(inner.recognizeImage(imagePayload))

  override def brandSamples(prompt: String): (Seq[String], Seq[String]) =
    withRetry(inner.brandSamples(prompt))

  override def correctRow(row: Map[String, String]): Option[Map[String, String]] =
    withRetry(inner.correctRow(row))
}

object RetryingLlmClient {
  /** Transient classification analog of the reference's 429/401 handling. */
  class TransientServiceError(msg: String) extends RuntimeException(msg)

  def defaultTransient(t: Throwable): Boolean = t match {
    case _: TransientServiceError => true
    case _: java.io.IOException => true
    case _ => false
  }
}
