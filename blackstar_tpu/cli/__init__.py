"""Command-line drivers: render, animate, generate-grid."""
