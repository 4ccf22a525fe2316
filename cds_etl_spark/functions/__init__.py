from cds_etl_spark.functions.vector import cosine_similarity, dot_product, l2_norm

__all__ = ["cosine_similarity", "dot_product", "l2_norm"]
