"""Plan-shape assertions: the explain() checks that keep scale habits honest."""
