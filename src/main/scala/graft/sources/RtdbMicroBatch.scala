package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}

/** Incremental RTDB tailing as a Structured Streaming micro-batch
  * source (`spark.readStream.format("graft.sources.RtdbSnapshotSource")`).
  *
  * The offset is a KEY CURSOR: each batch reads the children whose key
  * falls in (lastKey, latestKey] in code-point order. Firebase push IDs
  * are chronologically ordered by construction, so key-order tailing IS
  * time-order tailing for append-only trees — the natural incremental
  * path the reference's snapshot loop lacks (firebase_service.py re-reads
  * the whole tree each run). Semantics and caveats, stated plainly:
  *  - APPEND-ONLY tailing: a child inserted BELOW the cursor (non-push-ID
  *    key) or a mutation of an already-read child is not re-emitted —
  *    the standard key-cursor CDC limitation.
  *  - String-keyed trees only (push IDs are); RTDB's numeric-key
  *    ordering quirk does not arise because push IDs never parse as
  *    integers.
  *  - Exactly-once per key relative to the checkpoint: the cursor is
  *    the committed offset, so a retried batch re-plans the same
  *    (start, end] range deterministically offline; against a live
  *    service the range contents are as-of re-fetch (same at-least-once
  *    contract as any polling source).
  *
  * Each batch plans with the SAME machinery as the batch scan: the
  * byte-offset index offline (seek-based readers), single-key probes +
  * keyset-paged range fetches live. */
class RtdbMicroBatchStream(path: String, numPartitions: Int,
                           url: Option[String], authToken: Option[String],
                           pageSize: Int)
  extends MicroBatchStream {

  private val ord = RangePlanner.utf8Order

  /** Exclusive low key bound; None = from the beginning. */
  case class KeyOffset(last: Option[String]) extends Offset {
    // a key can contain anything — proper JSON string escaping via Jackson
    override def json(): String = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = m.createObjectNode()
      last.fold[Unit](node.putNull("last"))(k => { node.put("last", k); () })
      node.toString
    }
  }

  override def initialOffset(): Offset = KeyOffset(None)

  // The cursor must never move backwards: if every child is deleted,
  // a naive latestOffset() would return None, Spark would commit the
  // regressed offset, and keys re-inserted below the old cursor would
  // re-emit. Track the high-water mark — seeded on RESTART from the
  // checkpointed offsets via deserializeOffset (which Spark calls
  // during recovery BEFORE the first latestOffset poll).
  @volatile private var high: Option[String] = None
  private def bump(k: Option[String]): Unit = synchronized {
    if (k.isDefined && high.forall(h => ord.gt(k.get, h))) high = k
  }

  // latestOffset's poll already paid a full tokenization offline; keep
  // the (maxKey, index) so planInputPartitions for that same window
  // reuses it instead of re-tokenizing the export
  @volatile private var polledIndex: Option[(String, Seq[(String, Long)])] = None

  override def latestOffset(): Offset = {
    url match {
      case Some(u) =>
        // Two single-key probes per trigger — never the unpaginated
        // `shallow=true` listing, whose size grows with the whole tree
        // while the new tail stays small.
        val client = new RtdbRestClient(u, authToken)
        // The batch planner degrades integer-like-keyed paths to one
        // unpaged fetch (RTDB orders them numerically; lexicographic
        // cursors skip rows). A STREAM cannot degrade that way — the
        // cursor itself would be unsound ("10" < "9" lexicographically
        // means the tail never advances past "9") — so fail loudly.
        // ONE probe suffices: integer-like keys are served FIRST, so
        // the globally-first key is integer-like iff any key is.
        // Push-ID trees, the tailing use case, never trip this.
        if (client.firstKeyAt(path).exists(RtdbSnapshotSource.integerLike))
          throw new IllegalStateException(
            s"cannot tail '$path': integer-like child keys are served in numeric " +
              "order, which a lexicographic key cursor cannot page soundly — " +
              "read this path in batch mode instead")
        bump(client.lastKey(path))
      case None =>
        val idx = RtdbSnapshotSource.indexKeys(path)
        val mx = if (idx.isEmpty) None else Some(idx.map(_._1).max(ord))
        mx.foreach(m => polledIndex = Some((m, idx)))
        bump(mx)
    }
    KeyOffset(high)
  }

  override def deserializeOffset(json: String): Offset = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val last = node.get("last")
    val off = KeyOffset(if (last == null || last.isNull) None else Some(last.asText()))
    bump(off.last) // restart: re-seed the high-water mark from the checkpoint
    off
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[KeyOffset].last // exclusive
    val hi = end.asInstanceOf[KeyOffset].last   // inclusive
    bump(lo); bump(hi)
    if (hi.isEmpty) return Array.empty
    def inRange(k: String): Boolean =
      lo.forall(ord.gt(k, _)) && ord.lteq(k, hi.get)
    url match {
      case None =>
        val idx = polledIndex match {
          case Some((mx, i)) if hi.contains(mx) => i // reuse the poll's pass
          case _ => RtdbSnapshotSource.indexKeys(path) // e.g. checkpoint replay
        }
        val entries = idx
          .filter { case (k, off) => off >= 0 && inRange(k) }
          .sortBy(_._1)(ord)
        RtdbSnapshotSource.planIndexedPartitions(path, entries, numPartitions, None)
      case Some(_) =>
        // live: one range fetch per batch — the (lo, hi] window is the
        // new tail, small by construction under frequent triggers; the
        // fetch is keyset-paged so a large catch-up batch still
        // streams. Bounds via key successor: (lo, hi] = [lo+NUL, hi+NUL)
        // — keys that arrive after the latestOffset() poll fall OUTSIDE
        // the window and belong to the next batch, never double-read.
        val from = lo.map(k => k + Char.MinValue.toString)
        val toEx = Some(hi.get + Char.MinValue.toString)
        Array(RtdbRangePartition(path, from, toEx, None, url, authToken,
          pageSize): InputPartition)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = RtdbReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
