"""Self-contained record codecs (pure Python, public specs only):
CBOR (RFC 8949), MessagePack, Avro object container files, TOML
emit. Used by the format layer both driver-side (CLI pipe parity)
and executor-side (mapPartitions / binaryFiles readers)."""
