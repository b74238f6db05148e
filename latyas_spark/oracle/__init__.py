"""Golden-output oracle: an independent pure-Python port of the
reference's deterministic core, used only by tests and the fixture
golden generator — never by the Spark pipeline."""
