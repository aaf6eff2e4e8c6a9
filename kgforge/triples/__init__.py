"""Triple emission: MappingSpec → columnar Spark plan."""
