* Fixed-format torture: names with embedded spaces, $ comments,
* RHS on the objective row (objective constant = +1.5).
* Hand optimum: x=2, y=0, obj = 3.5
NAME          FIXSPACE
ROWS
 N  COST ROW
 E  ROW A
 L  ROW B
COLUMNS
    X VAR 1   COST ROW  1.0            ROW A     2.0
    X VAR 1   ROW B     1.0            $ comment in field 5
    X2        COST ROW  3.0            ROW A     1.0
RHS
    RHS       ROW A     4.0            ROW B     8.0
    RHS       COST ROW  -1.5
BOUNDS
 UP BND       X VAR 1   5.0
ENDATA
