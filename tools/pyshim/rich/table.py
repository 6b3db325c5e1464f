class Table:
    def __init__(self, *a, **k):
        self.rows = []
    def add_column(self, *a, **k):
        pass
    def add_row(self, *a, **k):
        pass
