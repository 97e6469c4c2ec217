"""Sources (SURVEY §2.1): files, Kafka, HTTP producers."""
