* BOUNDS entries with the bound-set name OMITTED ("UP COL VAL") plus a
* no-value type in both 2- and 3-token forms.
* min -x - y  s.t. x + y <= 10, x <= 2, y <= 3  ->  optimum -5.0
NAME          BNDNONAME
ROWS
 N  COST
 L  R1
COLUMNS
    X         COST      -1.0       R1        1.0
    Y         COST      -1.0       R1        1.0
RHS
    RHS       R1        10.0
BOUNDS
 UP X         2.0
 UP BND       Y         3.0
ENDATA
