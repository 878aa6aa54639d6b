"""Large-scale training-data pipeline operators.

Beyond the reference's CDC capability set, these are the operations a
100 TB transcript/document lake needs: dedup (exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding-cosine), similarity search (brute-force + LSH ANN),
text analysis (language-ID, quality scoring, token counting, fingerprinting)
and multimodal column plumbing.  Everything is built on native
``pyspark.sql.functions`` (JVM, whole-stage codegen) — pandas UDFs appear
only where a loop over array elements would otherwise be per-row Python.
"""

from singer_tap_spark.ops.text import (  # noqa: F401
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from singer_tap_spark.ops.cluster import near_dup_clusters  # noqa: F401
from singer_tap_spark.ops.incremental import (  # noqa: F401
    ClusterIndex,
    EmbeddingLSHIndex,
    IVFIndex,
    MinHashIndex,
    SimHashIndex,
    run_streaming_ann,
    run_streaming_dedup,
)
from singer_tap_spark.ops.dedup_text import (  # noqa: F401
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
)
from singer_tap_spark.ops.similarity import (  # noqa: F401
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_ann_topk,
    lsh_ann_topk,
)
from singer_tap_spark.ops.sample import (  # noqa: F401
    assign_splits,
    deterministic_sample,
    sample_key,
    stratified_sample,
)
from singer_tap_spark.ops.chunk import chunk_documents  # noqa: F401
from singer_tap_spark.ops.cluster import cluster_survivors  # noqa: F401
from singer_tap_spark.ops.curate import (  # noqa: F401
    curate,
    quantile_gate,
    remove_boilerplate_lines,
)
from singer_tap_spark.ops.multimodal import image_dims, video_meta  # noqa: F401
from singer_tap_spark.ops.sample import exact_k_sample, mixture_sample  # noqa: F401
from singer_tap_spark.ops.text import (  # noqa: F401
    normalize_text,
    redact_pii,
    vocab_top_k,
)
