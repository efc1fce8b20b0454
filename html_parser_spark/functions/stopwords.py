"""Shared stopword lists (Spark-free home).

Canonical source for both the JVM-side textstats/langid operators
(mirrored literally into their SQL oracles) and the pure-Python DOM
block scorer — living under functions/ so pure-Python consumers never
import Spark."""

STOP_EN = ("the", "and", "of", "to", "is", "in", "that", "it", "for", "was")
STOP_FR = ("le", "la", "les", "de", "des", "et", "est", "une", "que", "pour")
STOP_DE = ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu")
STOP_ES = ("el", "la", "los", "de", "que", "es", "una", "por", "con", "para")
