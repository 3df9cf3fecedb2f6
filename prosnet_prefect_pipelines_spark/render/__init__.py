"""Row -> triples rendering (SURVEY §2.8): the UDTF analog as explode."""
