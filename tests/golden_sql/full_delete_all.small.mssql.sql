DELETE w FROM resources w WHERE 1=1;

INSERT INTO resources (href, [key], modified, jsondata, resourcetype) SELECT href, [key], modified, jsondata, resourcetype FROM (SELECT href, [key], modified, jsondata, resourcetype, ROW_NUMBER() OVER (PARTITION BY href ORDER BY modified DESC) AS rn FROM stg) d WHERE rn = 1;
