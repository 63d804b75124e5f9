from imgfact_spark.sources.tsv import (  # noqa: F401
    read_triples_tsv,
    read_crawl_manifest,
    explode_manifest_images,
    read_entity_abstracts,
    read_scored_groundings,
    read_rel2desc,
    read_rel2id,
    read_aligned_source_prefix,
    write_tsv,
    audit_missing_partitions,
)
from imgfact_spark.sources.tfrecord import (  # noqa: F401
    land_tfrecords_to_parquet,
    read_tfrecord_examples,
    write_tfrecord_file,
    encode_example,
)
from imgfact_spark.sources.report import write_cluster_report  # noqa: F401
