"""Analysis / interpretability suite (reference L7 layer, SURVEY.md §1):
ISM, attributions, motif discovery, directed evolution, sequence format
conversion, plotting."""
