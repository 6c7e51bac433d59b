package graft.core

import scala.collection.concurrent.TrieMap

/** Deferred-result store — the analog of `RequestsTrack` + the status
  * handler's one-shot claim + the decay loop
  * (`/root/reference/ocr_results_storage.go:8-49`,
  * `/root/reference/ocr_rpc_client.go:197-228`,
  * `/root/reference/ocr_http_status_handler.go:16-56`):
  *
  *   - a deferred request registers an in-flight slot;
  *   - the worker completes it with the result;
  *   - `check` returns `processing` while in flight, and `done` + result
  *     EXACTLY ONCE (the claim deletes the slot — a second poll is
  *     `not found`, `ocr_results_storage.go:20-23`);
  *   - unclaimed results decay `timeoutSeconds + 10` after registration
  *     (`ocr_rpc_client.go:206-224` sleeps TimeOut+10 then deletes).
  *
  * The clock is injected so tests are deterministic. In the Spark pipeline
  * the same contract lives in [[graft.spark.Lineage]] (bucket commit rows);
  * this in-memory form pins the reference semantics for the local/serving
  * path.
  */
final class ResultsTrack(nowSeconds: () => Long = () => System.nanoTime() / 1000000000L) {

  private final case class Slot(result: Option[ExtractedText], deadline: Long)
  private final case class ExtractedText(text: String)

  private val slots = TrieMap.empty[String, Slot]

  val DecayGraceSeconds = 10L // ocr_rpc_client.go:206 (timeout + 10s)

  /** Register an in-flight deferred request. */
  def register(id: String, timeoutSeconds: Long): Unit = {
    val clamped = Extractor.clampTimeout(timeoutSeconds)
    slots.put(id, Slot(None, nowSeconds() + clamped + DecayGraceSeconds))
  }

  /** Worker delivers the result for a registered request. */
  def complete(id: String, text: String): Unit =
    slots.updateWith(id) {
      case Some(s) => Some(s.copy(result = Some(ExtractedText(text))))
      case None    => None // request already decayed: result dropped
    }

  /** Poll — returns (status, text): `done` claims the result ONCE;
    * `processing` while in flight; `not found` otherwise (unknown id,
    * already claimed, or decayed).
    */
  def check(id: String): (String, String) = {
    expire()
    slots.get(id) match {
      case Some(Slot(Some(r), _)) =>
        slots.remove(id) // one-shot claim, ocr_results_storage.go:20-23
        ("done", r.text)
      case Some(Slot(None, _)) => ("processing", "")
      case None                => ("not found", "")
    }
  }

  /** Drop slots past their decay deadline (the reference runs this as a
    * per-request goroutine; we sweep on access).
    */
  def expire(): Unit = {
    val now = nowSeconds()
    slots.filterInPlace { case (_, s) => s.deadline > now }
  }

  def inFlight: Int = slots.size
}
