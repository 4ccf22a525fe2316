from cds_etl_spark.model.schema import Model, PropDef, Relationship, load_model

__all__ = ["Model", "PropDef", "Relationship", "load_model"]
