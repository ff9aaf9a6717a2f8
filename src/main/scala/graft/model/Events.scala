package graft.model

import java.time.Instant

/** Typed row models for the `events` table (the k8s Event analog: the
  * reference's uid:resource_version key space maps to user_id:event_type,
  * cf. /root/reference/src/types.rs:21).
  * `Instant` keeps microsecond precision (java.sql.Timestamp.getTime
  * would truncate to ms and diverge from the oracle).
  */
final case class Ev(event_id: Long, ts: Instant, user_id: Long, event_type: String)

/** [[Ev]] carrying the numeric `value` column — the input shape for
  * streaming operators that sketch a measure (quantile sample). */
final case class EvVal(event_id: Long, ts: Instant, user_id: Long,
    event_type: String, value: Double)

final case class EmittedEv(key: String, ts: Instant, event_id: Long)

/** A document arriving on an incremental-ingest stream (the streaming
  * curation pipeline's input shape; `ingest_ts` is the event time the
  * dedup watermark advances on).
  */
final case class IngestDoc(doc_id: Long, text: String, lang: String, ingest_ts: Instant)
