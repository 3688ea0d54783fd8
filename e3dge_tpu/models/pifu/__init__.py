"""E1 PIFu-style local branch (hourglass filter + pixel-aligned query)."""
