package graft.model

/**
 * Typed data model (SURVEY §1.1): the public ingest/query API surfaces
 * `Dataset[_]` of these case classes; engine internals stay `DataFrame` so
 * Catalyst can optimize freely (SURVEY §1.3).
 */

/** Mirror of the reference's `Document` dataclass
  * (`/root/reference/document_processor.py:39-42`). */
final case class Document(page_content: String, metadata: DocMetadata)

/** The closed metadata-field set produced by the reference's
  * `extract_document_metadata` (`/root/reference/document_processor.py:57-73`)
  * plus the PDF-path `page_number` (`:471-472`). Dates are ISO-8601 strings
  * at the API edge, as in the reference. */
final case class DocMetadata(
    file_path: String,
    file_type: String,
    file_name: String,
    creation_date: String,
    modification_date: String,
    hash: String,
    document_type: String,
    page_number: Option[Int] = None)

/** One vector record — a cell of the reference's TileDB sparse array
  * (`/root/reference/vector_db_creator.py:251-267`). */
final case class Chunk(
    id: Long,
    vector: Array[Float],
    text: String,
    metadata: DocMetadata)

/** Query result row with injected score fields
  * (`/root/reference/vector_db_query.py:232-233`). */
final case class SearchHit(
    id: Long,
    text: String,
    metadata: DocMetadata,
    similarity_score: Double,
    distance: Double)

/** `index_metadata.json` contents
  * (`/root/reference/vector_db_creator.py:346-354`). */
final case class IndexMetadata(
    distance_metric: String,
    dimensions: Int,
    vector_type: String,
    index_type: String,
    num_vectors: Long)

/** Catalog entry per database
  * (`/root/reference/config.py:64-67,95,175-181`). */
final case class DatabaseInfo(
    model: String,
    chunk_size: Int,
    chunk_overlap: Int)

/** Per-file citation produced by the RAG answer path
  * (`/root/reference/utilities.py:24-77`). */
final case class Citation(
    file_name: String,
    file_path: String,
    file_type: String,
    score_range: String,
    pages: String,
    min_score: Double)

/** Leakage-safe split assignment ([[graft.ops.Curation.leakageSafeSplit]]):
  * every member of a near-dup cluster lands in the same split. */
final case class SplitAssignment(id: Long, cluster_id: Long, split: String)

/** Curriculum dataloader slot ([[graft.ops.Curation.curriculumOrder]]):
  * difficulty bin (1 = easiest) and 1-based global position. */
final case class CurriculumSlot(id: Long, bin: Long, ord: Long)

/** Contrastive training triplet ([[graft.ops.Curation.contrastiveTriplets]]):
  * anchor, verified-paraphrase positive, hard out-of-cluster negative. */
final case class Triplet(anchor_id: Long, pos_id: Long, neg_id: Long,
    neg_sim: Double)

/** Deterministic per-epoch training order slot
  * ([[graft.ops.Curation.epochShuffle]]). */
final case class EpochSlot(id: Long, ord: Long)

/** DPO/RLHF preference pair ([[graft.ops.Curation.preferencePairs]]):
  * per-prompt-group score extremes with the margin between them. */
final case class PreferencePair(grp: String, chosen_id: Long,
    chosen_score: Double, rejected_id: Long, rejected_score: Double,
    margin: Double, n_candidates: Long)

/** Fill-in-the-middle training example
  * ([[graft.ops.Curation.fimTransform]]): `fim` marks rewritten rows. */
final case class FimExample(id: Long, fim: Boolean, out_text: String)

/** T5 span-corruption example ([[graft.ops.Curation.spanCorruption]]):
  * sentinel-masked input and its paired target sequence. */
final case class CorruptedExample(id: Long, input: String, target: String,
    n_spans: Long)

/** Domain-gate verdict ([[graft.ops.Curation.domainRollup]]). */
final case class DomainVerdict(source: String, n_docs: Long,
    mean_score: Double, low_share: Double, keep: Boolean)

/** Margin-mined cross-set pair ([[graft.ops.Ann.bitextMine]]): `mutual`
  * marks pairs that are best matches in both directions. */
final case class BitextPair(a_id: Long, b_id: Long, cos: Double,
    margin: Double, mutual: Boolean)

/** Assembled chat document ([[graft.ops.TextAnalysis.conversationAssemble]]):
  * `valid` = user-led strict role alternation. */
final case class Conversation(conv_id: Long, n_turns: Long, valid: Boolean,
    text: String)

/** One DoReMi reweighting round's verdict per domain
  * ([[graft.ops.Curation.domainReweight]]). */
final case class DomainWeight(source: String, n_docs: Long,
    mean_loss: Double, w_ref: Double, w_new: Double)

/** Retrieval-quality metrics per query
  * ([[graft.ops.Ann.retrievalMetrics]]). */
final case class RetrievalQuality(query_id: String, recall: Double,
    mrr: Double, ndcg: Double)

/** Logistic-classifier score ([[graft.ops.Classify.logisticPredict]]). */
final case class LogisticScore(id: Long, p: Double, pred: Boolean)

/** One teacher-scored distillation pair
  * ([[graft.ops.Rerank.distillationPairs]]). */
final case class DistillPair(qid: Long, did: Long, t_score: Double,
    rnk: Int, is_pos: Boolean)

/** One inverse-cloze-task training pair ([[graft.ops.Curation.ictPairs]]). */
final case class IctPair(id: Long, n_units: Long, q_idx: Long,
    query_text: String, context_text: String, kept: Boolean)

/** A document's packed-bin slot ([[graft.ops.Curation.packAssign]]). */
final case class PackSlot(id: Long, bin: Long, t: Long)

/** Embedding-space outlier verdict ([[graft.ops.Ivf.embeddingOutliers]]). */
final case class EmbeddingOutlier(id: Long, cluster: Long,
    cent_sim: Double, outlier: Boolean)

/** One diversity-first inspection pick ([[graft.ops.Ivf.diverseSample]]). */
final case class DiversePick(id: Long, cluster: Long, rnd: Long)

/** One layered-graph ANN edge ([[graft.ops.Hnsw.buildExact]]/`buildIvf`;
  * `rnk` 0 marks the ring-connectivity successor). */
final case class HnswEdge(level: Int, id: Long, rnk: Int, nbr: Long,
    sim: Double)

/** One data-quality expectation result ([[graft.ops.Profile.dqReport]] /
  * `dqUnique` / `dqRefIntegrity` — the shared report row). */
final case class DqCheck(rule: String, n_rows: Long, violations: Long,
    pass_rate: Double)

/** One Kaplan–Meier survival-curve step
  * ([[graft.ops.Analytics.kaplanMeier]]). */
final case class KmStep(t: Long, n_risk: Long, n_event: Long,
    survival: Double)

/** One directed association rule
  * ([[graft.ops.Analytics.associationRules]]). */
final case class AssocRule(antecedent: Long, consequent: Long, n_ab: Long,
    support: Double, confidence: Double, lift: Double)

/** Per-key Holt level+trend state ([[graft.ops.Temporal.holtSmooth]]). */
final case class HoltState(k: Long, n: Long, level: Double, trend: Double,
    forecast: Double)

/** One maximal repeated token run ([[graft.ops.Suffix.maximalRepeats]]). */
final case class MaximalRepeat(len: Long, gram: String, n_occ: Long,
    n_left: Long, n_right: Long)

/** One inverted-index posting entry
  * ([[graft.ops.Keyword.postingLists]]). */
final case class PostingEntry(term: String, df: Long, tf_total: Long,
    postings: Seq[Long])

/** One k-core member with its in-core degree ([[graft.ops.Graph.kCore]]). */
final case class CoreNode(id: Long, core_degree: Long)

/** One BFS hop distance from the seed set
  * ([[graft.ops.Graph.bfsDistances]]). */
final case class HopDistance(id: Long, dist: Long)

/** One HITS hub/authority score pair ([[graft.ops.Graph.hits]]). */
final case class HitsScore(id: Long, hub_micro: Long, auth_micro: Long)
