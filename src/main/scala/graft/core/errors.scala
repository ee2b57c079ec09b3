package graft.core

/** Error taxonomy — one-to-one with the reference's `src/error.rs`.
  *
  * The load-bearing distinction (reference `src/error.rs:213-230`,
  * `src/processor.rs:106-119`):
  *   - [[ProcessingError.SoftFailure]] → retry the record forever (each
  *     attempt bounded only by the per-attempt processing timeout);
  *   - [[ProcessingError.HardFailure]] → skip the record, keep the batch
  *     going, and let the checkpoint advance past it.
  */
sealed abstract class GraftError(message: String, cause: Throwable = null)
    extends Exception(message, cause)

/** Per-record processing outcome errors (reference `src/error.rs:213-230`). */
sealed abstract class ProcessingError(message: String, cause: Throwable = null)
    extends GraftError(message, cause)
object ProcessingError {
  final case class SoftFailure(msg: String, underlying: Throwable = null)
      extends ProcessingError(s"soft failure: $msg", underlying)
  final case class HardFailure(msg: String, underlying: Throwable = null)
      extends ProcessingError(s"hard failure: $msg", underlying)
}

/** Pre-checkpoint validation errors (reference `src/error.rs:238-255`):
  * Soft → re-validate forever; Hard → the checkpoint is NOT saved and the
  * batch fails. (The reference's trait doc comment says "proceed with
  * checkpoint", but its `handle_checkpointing` implementation returns
  * `ProcessorError::CheckpointError` without saving,
  * `src/processor.rs:1594-1596`; we follow the implementation.) */
sealed abstract class BeforeCheckpointError(message: String, cause: Throwable = null)
    extends GraftError(message, cause)
object BeforeCheckpointError {
  final case class SoftError(msg: String, underlying: Throwable = null)
      extends BeforeCheckpointError(s"soft checkpoint validation error: $msg", underlying)
  final case class HardError(msg: String, underlying: Throwable = null)
      extends BeforeCheckpointError(s"hard checkpoint validation error: $msg", underlying)
}

/** Retry-utility errors (reference `src/error.rs:98-108`). */
sealed abstract class RetryError(message: String, cause: Throwable = null)
    extends GraftError(message, cause)
object RetryError {
  final case class ExhaustedRetries(attempts: Int, last: Throwable)
      extends RetryError(s"exhausted $attempts retries", last)
  final case class Interrupted(msg: String) extends RetryError(s"retry interrupted: $msg")
}

/** Checkpoint store errors (reference `src/error.rs:111-121`). */
final case class CheckpointError(msg: String, underlying: Throwable = null)
    extends GraftError(s"checkpoint error: $msg", underlying)

/** Per-shard fatal errors (reference `src/error.rs:123-134`). */
final case class ShardError(shardId: String, msg: String, underlying: Throwable = null)
    extends GraftError(s"shard $shardId: $msg", underlying)

/** Top-level processor errors — the subset of the reference's 15
  * `ProcessorError` variants (`src/error.rs:10-56`) that are reachable in
  * this engine (AWS-SDK-specific wrappers collapse into `ClientError`). */
sealed abstract class ProcessorError(message: String, cause: Throwable = null)
    extends GraftError(message, cause)
object ProcessorError {
  final case class ConfigError(msg: String) extends ProcessorError(s"config error: $msg")
  final case class ClientError(msg: String, underlying: Throwable = null)
      extends ProcessorError(s"client error: $msg", underlying)
  final case class ExpiredIterator(shardId: String)
      extends ProcessorError(s"iterator expired for shard $shardId")
  final case class CheckpointFailure(shardId: String, underlying: Throwable)
      extends ProcessorError(s"checkpoint failure for shard $shardId", underlying)
  case object Shutdown extends ProcessorError("shutdown requested")
  case object TotalProcessingTimeout extends ProcessorError("total processing timeout elapsed")
  final case class ShardFailure(err: ShardError) extends ProcessorError(err.getMessage, err)
}
