"""Column-function libraries: cleansing scalars, text analysis, vectors."""
