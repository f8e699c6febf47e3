"""Named-query modules; importing a module registers its queries."""
