* Extra N rows are free rows: their COLUMNS/RHS entries must be DROPPED
* (only the first N row is the objective).
* min x  s.t. x >= 1  ->  optimum 1.0  (FREE row would give 100 if kept)
NAME          FREEROWS
ROWS
 N  COST
 N  FREE
 G  R1
COLUMNS
    X         COST      1.0        FREE      100.0
    X         R1        1.0
RHS
    RHS       R1        1.0        FREE      7.0
ENDATA
