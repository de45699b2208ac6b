"""Sources & sinks: record generator, Kafka IO, admin lifecycle."""
