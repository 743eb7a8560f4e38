"""Sources: pages-table scans and layout helpers."""
