"""Composable query operators: each is ``f(DataFrame, ...) -> DataFrame``."""
