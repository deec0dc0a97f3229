from corral_spark.pipelines.pretrain import prepare_pretraining_corpus

__all__ = ["prepare_pretraining_corpus"]
